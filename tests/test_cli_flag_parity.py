"""Drop-in CLI parity: every option flag a reference script accepts must be
registered by our same-named script.

The scripts follow the repo convention of building ``parser`` at module
top level with heavy imports deferred into ``__main__``, so each module
imports cheaply and its ``parser._option_string_actions`` lists exactly
the accepted option strings (long names and short aliases)."""
import importlib.util
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

_FLAG_RE = re.compile(
    r"add_argument\(\s*((?:['\"]-{1,2}[\w-]+['\"]\s*,?\s*)+)", re.S
)
_OPT_RE = re.compile(r"['\"](-{1,2}[\w-]+)['\"]")


def _reference_flags(path):
    src = open(path).read()
    flags = []
    for m in _FLAG_RE.finditer(src):
        flags.extend(_OPT_RE.findall(m.group(1)))
    return sorted(set(flags))


def _load_parser(script):
    spec = importlib.util.spec_from_file_location(
        f"cli_parity_{script[:-3]}", os.path.join(REPO, script)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parser


def _scripts():
    if not os.path.isdir(REF):
        return []
    out = []
    for f in sorted(os.listdir(REF)):
        if f.endswith(".py") and os.path.exists(os.path.join(REPO, f)):
            flags = _reference_flags(os.path.join(REF, f))
            if flags:
                out.append((f, flags))
    return out


@pytest.mark.parametrize("script,ref_flags", _scripts(),
                         ids=[s for s, _ in _scripts()])
def test_reference_flags_accepted(script, ref_flags):
    parser = _load_parser(script)
    accepted = set(parser._option_string_actions)
    missing = [f for f in ref_flags if f not in accepted]
    assert not missing, f"{script} missing reference flags: {missing}"


# Deliberate default deviations from the reference, each with a reason.
_DEFAULT_DEVIATIONS = {
    # ours=None means "use --image-index"; the richer default keeps the
    # attribute-slider GUI as the primary surface
    ("mnist_mix_vae_gui.py", "--original"),
    # reference's own --latent-dim crashes its script (MorphoMNISTVAE takes
    # no latent_dim); we accept the flag but read latent from the checkpoint
    ("mnist_vae_counterfactuals.py", "--latent-dim"),
    ("mnist_vae_measured_cf.py", "--latent-dim"),
    # ours=None sweeps all three attributes (superset of the reference's
    # single-attribute default)
    ("mnist_vae_measured_cf.py", "--cf-attribute"),
    # sanity-check-only flag: the pkl stores the metric it was built with
    ("show_cf_matrix.py", "--metric"),
    # reference saves to a bare file path; our artifact layout is
    # dir-based (ae-{cls}.tar), asserted by the battery tests
    ("train_morphomnist_ae.py", "--output-path"),
    ("train_esrf_bigan.py", "--output-path"),
    # '' and None both mean "default/synthetic data source" in our loaders
    ("finetune_audio_mnist_bigan.py", "--data"),
    ("mnist_generator_score.py", "--data-dir"),
    ("mnist_vae_generator_score.py", "--data-dir"),
}


def _ref_defaults(path):
    import ast

    out = {}
    for node in ast.walk(ast.parse(open(path).read())):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            names = [a.value for a in node.args
                     if isinstance(a, ast.Constant) and isinstance(a.value, str)]
            longs = [n for n in names if n.startswith("--")]
            if not longs:
                continue
            for kw in node.keywords:
                if kw.arg == "default":
                    try:
                        out[longs[0]] = ast.literal_eval(kw.value)
                    except Exception:
                        pass
    return out


@pytest.mark.parametrize("script,ref_flags", _scripts(),
                         ids=[s for s, _ in _scripts()])
def test_reference_defaults_match(script, ref_flags):
    ref_def = _ref_defaults(os.path.join(REF, script))
    parser = _load_parser(script)
    acts = parser._option_string_actions
    drift = []
    for flag, rd in sorted(ref_def.items()):
        if flag not in acts or (script, flag) in _DEFAULT_DEVIATIONS:
            continue
        od = acts[flag].default
        if rd != od and rd is not None:
            drift.append(f"{flag}: ref={rd!r} ours={od!r}")
    assert not drift, f"{script} default drift: {drift}"
