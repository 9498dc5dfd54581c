"""Regenerate every TPU perf number in the docs from the latest bench record.

Single source of truth (VERDICT r2 item 6): the driver-captured
``BENCH_r{N}.json`` with the highest N (falling back to ``.bench_last.json``
from a local ``python bench.py`` run) is rendered into marker-delimited
blocks in README.md, RESULTS.md and docs/PERF.md:

    <!-- bench:begin -->
    ... generated, do not hand-edit ...
    <!-- bench:end -->

Run ``python tools/perf_report.py`` after any bench run; ``--check`` exits
non-zero if the docs are stale (used by tests/test_cli.py to keep the
numbers from drifting the way round 1's did).

Host-CPU numbers (morphometry engine, dataset synthesis) live outside the
blocks: they come from fixed measurement scripts, not bench.py, and are
unaffected by the TPU timer protocol.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- bench:begin -->", "<!-- bench:end -->"


def _git_tracked() -> set[str] | None:
    """Basenames of git-tracked files, or None if git is unavailable."""
    try:
        out = subprocess.run(
            ["git", "-C", ROOT, "ls-files", "BENCH_r*.json"],
            capture_output=True, text=True, timeout=30)
        if out.returncode != 0:
            return None
        return {os.path.basename(l) for l in out.stdout.splitlines() if l}
    except Exception:
        return None


def latest_record(committed_only: bool = False):
    """(record, source_name) for the newest driver bench capture.

    With ``committed_only`` (used by ``--check``), untracked BENCH files are
    ignored: the round driver drops ``BENCH_r{N}.json`` *after* the round's
    last commit, and without this filter that drop retroactively reddens a
    finished round's doc-freshness test (VERDICT r3 weak item 1).
    """
    tracked = _git_tracked() if committed_only else None
    rounds = []
    for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and (tracked is None or os.path.basename(p) in tracked):
            rounds.append((int(m.group(1)), p))
    for _, p in sorted(rounds, reverse=True):
        rec = json.load(open(p))
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if parsed and parsed.get("value"):
            return parsed, os.path.basename(p)
    p = os.path.join(ROOT, ".bench_last.json")
    if os.path.exists(p):
        return json.load(open(p)), ".bench_last.json"
    raise SystemExit("no bench record found (run `python bench.py` first)")


def _fmt(v, nd=0):
    if v is None:
        return "n/a"
    return f"{v:,.{nd}f}"


def render(rec: dict, source: str) -> str:
    """One canonical markdown table; every number traces to `source`."""
    dev = rec.get("device", "tpu")
    rows = [
        ("MNIST BiGAN train steps/sec (batch 64, f32, parity config)",
         f"**{_fmt(rec.get('value'))}**",
         f"{_fmt(rec.get('mfu_pct'))}% MFU, {_fmt(rec.get('gflops_per_step'), 1)} GFLOP/step;"
         " HBM-bound (docs/PERF.md)"),
        ("MNIST BiGAN steps/sec (batch 256, bf16 throughput config)",
         _fmt(rec.get("bf16_b256_steps_per_sec")),
         f"{_fmt(rec.get('bf16_b256_mfu_pct'))}% MFU"),
        ("batched CF images/sec (abduct–act–predict, batch 2048)",
         f"**{_fmt(rec.get('cf_images_per_sec'))}**",
         "one jitted program (SCM flows + E + G)"
         + ("; scanned-dispatch protocol (docs/PERF.md)"
            if rec.get("cf_protocol") else "")),
        ("AudioMNIST BiGAN (128², d=64) steps/sec (batch 128)",
         _fmt(rec.get("audio_bigan_steps_per_sec"), 1),
         "MXU-bound, ~40% of bf16 peak in f32 (docs/PERF.md)"),
    ]
    if rec.get("cf_bf16_images_per_sec") is not None:
        rows.insert(
            [r[0] for r in rows].index(
                "batched CF images/sec (abduct–act–predict, batch 2048)") + 1,
            ("batched CF images/sec (bf16 E/G forwards)",
             _fmt(rec.get("cf_bf16_images_per_sec")),
             "pure-inference option via the model config's compute_dtype"))
    if rec.get("fused_f32_b64_steps_per_sec") is not None:
        rows.insert(2, (
            "MNIST BiGAN steps/sec (batch 64, f32, fused throughput config)",
            _fmt(rec.get("fused_f32_b64_steps_per_sec")),
            "opt-in D-step/EG fusions + bf16 Adam moment (docs/PERF.md)"))
    if rec.get("whale_bigan_steps_per_sec") is not None:
        rows.append((
            "Whale BiGAN (256², d=64) steps/sec (batch "
            f"{rec.get('whale_batch_size', 32)}, {rec.get('whale_dtype', 'f32')})",
            _fmt(rec.get("whale_bigan_steps_per_sec"), 2),
            f"{_fmt(rec.get('whale_mfu_pct'))}% MFU" if rec.get("whale_mfu_pct") else "",
        ))
    if rec.get("esrf_bigan_steps_per_sec") is not None:
        rows.append((
            "ESRF BiGAN (512², full width) steps/sec (batch "
            f"{rec.get('esrf_batch_size', 64)}, {rec.get('esrf_dtype', 'bf16')})",
            _fmt(rec.get("esrf_bigan_steps_per_sec"), 2),
            f"{_fmt(rec.get('esrf_mfu_pct'))}% MFU" if rec.get("esrf_mfu_pct") else "",
        ))
    base = rec.get("vs_baseline")
    rows.append((
        "reference's own train loop (torch, this host's CPU)",
        rec.get("baseline", "n/a").replace(
            "reference torch train loop, CPU, this host ", ""),
        f"our parity config is **{_fmt(base)}×** faster" if base else "",
    ))
    lines = [
        BEGIN,
        f"<!-- generated by tools/perf_report.py from {source}; do not hand-edit. -->",
        f"Source: `{source}` ({dev}, single chip; hard device→host sync barrier,",
        f"step time {_fmt(rec.get('step_time_ms'), 2)} ms at the parity config).",
        "",
        "| metric | value | note |",
        "|---|---|---|",
    ]
    lines += [f"| {m} | {v} | {n} |" for m, v, n in rows]
    lines.append(END)
    return "\n".join(lines)


def splice(path: str, block: str, check: bool) -> bool:
    """Replace the marker block in `path`. Returns True if file changed."""
    text = open(path).read()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if not pat.search(text):
        raise SystemExit(f"{path}: missing {BEGIN} marker")
    new = pat.sub(lambda _: block, text, count=1)
    if new == text:
        return False
    if not check:
        open(path, "w").write(new)
    return True


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if any doc is stale instead of rewriting")
    args = ap.parse_args(argv)
    rec, source = latest_record(committed_only=args.check)
    block = render(rec, source)
    stale = []
    for rel in ("README.md", "RESULTS.md", "docs/PERF.md"):
        if splice(os.path.join(ROOT, rel), block, args.check):
            stale.append(rel)
    if args.check and stale:
        print(f"stale perf blocks (run tools/perf_report.py): {stale}")
        return 1
    print(f"perf blocks {'checked' if args.check else 'updated'} from {source}"
          + (f"; rewrote {stale}" if stale and not args.check else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
