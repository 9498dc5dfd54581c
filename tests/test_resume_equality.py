"""Interrupted-and-resumed training must reproduce the uninterrupted run.

The whale trainers' --resume reloads params + optimizer state
template-typed and re-enters the epoch loop at the recorded epoch; with
the same seed the per-epoch shuffle keys (fold_in(key, epoch)) are
identical, so a 2-epoch run resumed for 2 more must match a straight
4-epoch run bit-for-bit (f32 msgpack round-trip is exact)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, out_dir, steps, resume=False, extra=()):
    cmd = [
        sys.executable, "-u", os.path.join(REPO, script),
        "--synthetic-clips", "8", "--d", "2", "--batch-size", "8",
        "--steps", str(steps), "--checkpoint-every", "2",
        "--output-path", str(out_dir), *extra,
    ]
    if resume:
        cmd.append("--resume")
    # single-device CPU: the conftest's inherited 8-way virtual mesh can't
    # shard the 19-window tiny stand-in
    env = dict(os.environ, IMAGECFGEN_PLATFORM="cpu", XLA_FLAGS="")
    subprocess.run(cmd, check=True, env=env, timeout=900,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in sorted(tree.items()):
            yield from _leaves(v, f"{prefix}/{k}")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaves(v, f"{prefix}/{i}")
    else:
        yield prefix, np.asarray(tree)


def _assert_equal(path_a, path_b):
    from imagecfgen_tpu.core.checkpoint import load_checkpoint

    ta, _ = load_checkpoint(path_a)
    tb, _ = load_checkpoint(path_b)
    la, lb = dict(_leaves(ta)), dict(_leaves(tb))
    assert la.keys() == lb.keys()
    for k in la:
        np.testing.assert_array_equal(la[k], lb[k], err_msg=k)


@pytest.mark.slow
def test_whale_bigan_resume_matches_straight_run(tmp_path):
    straight, split = tmp_path / "straight", tmp_path / "split"
    straight.mkdir(), split.mkdir()
    _run("train_whale_bigan.py", straight, steps=4)
    _run("train_whale_bigan.py", split, steps=2)
    _run("train_whale_bigan.py", split, steps=4, resume=True)
    _assert_equal(straight / "whale-bigan.tar", split / "whale-bigan.tar")


@pytest.mark.slow
def test_whale_vae_resume_matches_straight_run(tmp_path):
    straight, split = tmp_path / "straight", tmp_path / "split"
    straight.mkdir(), split.mkdir()
    _run("train_whale_vae.py", straight, steps=4)
    _run("train_whale_vae.py", split, steps=2)
    _run("train_whale_vae.py", split, steps=4, resume=True)
    _assert_equal(straight / "whale-vae.tar", split / "whale-vae.tar")


@pytest.mark.slow
def test_mnist_bigan_resume_matches_straight_run(tmp_path):
    """Same property through train_mnist_image_scm.py (shared load_resume)."""
    data = tmp_path / "data"
    data.mkdir()
    env = dict(os.environ, IMAGECFGEN_PLATFORM="cpu", XLA_FLAGS="")
    subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "create_train_dataset.py"),
         "--synthetic", "128", "--out-dir", str(data)],
        check=True, env=env, timeout=900,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def run(out_dir, steps, resume):
        cmd = [sys.executable, "-u", os.path.join(REPO, "train_mnist_image_scm.py"),
               "--data-dir", str(data), "--steps", str(steps),
               "--checkpoint-every", "2", "--save-images-every", "0",
               "--output-path", str(out_dir)]
        if resume:
            cmd.append("--resume")
        subprocess.run(cmd, check=True, env=env, timeout=900,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    straight, split = tmp_path / "straight", tmp_path / "split"
    straight.mkdir(), split.mkdir()
    run(straight, 4, False)
    run(split, 2, False)
    run(split, 4, True)
    _assert_equal(straight / "mnist-bigan.tar", split / "mnist-bigan.tar")


@pytest.mark.slow
def test_esrf_bigan_resume_matches_straight_run(tmp_path):
    """Same property for the 512-squared family (remat path included)."""
    env = dict(os.environ, IMAGECFGEN_PLATFORM="cpu", XLA_FLAGS="")

    def run(out_dir, steps, resume):
        cmd = [sys.executable, "-u", os.path.join(REPO, "train_esrf_bigan.py"),
               "--d", "2", "--batch-size", "4", "--max-batches", "2",
               "--steps", str(steps), "--checkpoint-every", "2",
               "--output-path", str(out_dir)]
        if resume:
            cmd.append("--resume")
        subprocess.run(cmd, check=True, env=env, timeout=900,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    straight, split = tmp_path / "straight", tmp_path / "split"
    straight.mkdir(), split.mkdir()
    run(straight, 4, False)
    run(split, 2, False)
    run(split, 4, True)
    _assert_equal(straight / "esrf-bigan.tar", split / "esrf-bigan.tar")
