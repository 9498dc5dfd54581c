"""Checkpointing: one pytree format for every artifact.

The reference uses two inconsistent ``torch.save`` conventions (whole
pickled modules vs state-dicts — SURVEY §5) with hardcoded ``.tar`` names
(``mnist-bigan.tar``, ``mnist-vae.tar``, ``mnist-attribute-scm.tar``, ...).
Here every checkpoint is a single msgpack-serialised pytree with a small
JSON-able ``meta`` header; the CLI keeps the legacy file *names* so script
invocations stay drop-in compatible, while the payload is this format.

Training states additionally go through :func:`save_train_state` /
:func:`restore_train_state`, which include params, optimizer state and step
so interrupted runs resume — a capability the reference lacks entirely
(checkpoints only written after the full run, ``train_mnist_image_scm.py:61-67``).
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from imagecfgen_tpu.utils.heartbeat import Heartbeat

_MAGIC = b"ICFT"  # imagecfgen-tpu checkpoint
_VERSION = 1


def fetch_tree(tree: Any, chunk_bytes: int = 32 << 20,
               progress_bytes: int = 128 << 20) -> Any:
    """Device->host fetch of a pytree in bounded-size chunks.

    A single monolithic ``jax.device_get`` of a multi-GB train state over
    the axon tunnel can stall indefinitely with zero observable IO in the
    client process (the whale battery's epoch-250 checkpoint froze for
    7+ minutes until the stage watchdog killed it), while the small
    per-step transfers training does constantly are fine. So: fetch leaf
    by leaf, slicing any leaf larger than ``chunk_bytes`` along its
    leading axis, and print progress every ``progress_bytes`` so a log-
    watching stall detector (tools/tpu_stage.sh) sees a live process.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    total = sum(l.nbytes for l in leaves if isinstance(l, jax.Array))
    verbose = total >= progress_bytes
    if verbose:
        print(f"[checkpoint] fetching {total / 2**20:.0f} MB from device",
              flush=True)
    fetched, last_mark = 0, 0
    out = []
    for leaf in leaves:
        if not isinstance(leaf, jax.Array):
            out.append(leaf)
            continue
        if leaf.ndim == 0 or leaf.nbytes <= chunk_bytes:
            out.append(jax.device_get(leaf))
        else:
            # flatten so the bound holds for ANY shape (a single row of a
            # wide leaf can itself exceed chunk_bytes)
            flat = leaf.reshape((-1,))
            elems = max(int(chunk_bytes // max(leaf.dtype.itemsize, 1)), 1)
            parts = []
            for i in range(0, flat.shape[0], elems):
                parts.append(jax.device_get(flat[i : i + elems]))
                fetched_part = sum(p.nbytes for p in parts)
                if verbose and fetched + fetched_part - last_mark >= progress_bytes:
                    last_mark = fetched + fetched_part
                    print(f"[checkpoint] fetched {last_mark / 2**20:.0f}"
                          f"/{total / 2**20:.0f} MB", flush=True)
            out.append(np.concatenate(parts).reshape(leaf.shape))
        fetched += leaf.nbytes
        if verbose and fetched - last_mark >= progress_bytes:
            last_mark = fetched
            print(f"[checkpoint] fetched {fetched / 2**20:.0f}"
                  f"/{total / 2**20:.0f} MB", flush=True)
    if verbose:
        print(f"[checkpoint] fetch complete ({total / 2**20:.0f} MB)",
              flush=True)
    return jax.tree_util.tree_unflatten(treedef, out)


class _Heartbeat(Heartbeat):
    """Checkpoint-prefixed liveness line while a silent CPU-bound phase
    runs (flax serialize/parse of a multi-GB state; the stall watchdog
    killed a healthy 8.3 GB ESRF save exactly there in round 3 — see
    :mod:`imagecfgen_tpu.utils.heartbeat`)."""

    def __init__(self, label: str, interval: float = 60.0):
        super().__init__(label, interval, prefix="checkpoint")


def save_checkpoint(path: str, tree: Any, meta: Optional[Dict] = None) -> None:
    """Atomically write ``tree`` (any pytree of arrays/scalars) + meta."""
    tree = fetch_tree(tree)
    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "nbytes"))
    verbose = total >= (512 << 20)
    if verbose:
        print(f"[checkpoint] serializing {total / 2**20:.0f} MB", flush=True)
    with _Heartbeat("serializing"):
        payload = serialization.to_bytes(tree)
    meta_bytes = json.dumps(meta or {}).encode("utf-8")
    tmp = path + ".tmp"
    with _Heartbeat("writing"), open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", _VERSION, len(meta_bytes)))
        f.write(meta_bytes)
        # chunked writes so the watchdog's IO probe sees steady progress
        view = memoryview(payload)
        for i in range(0, len(view), 256 << 20):
            f.write(view[i : i + (256 << 20)])
    os.replace(tmp, path)
    if verbose:
        print(f"[checkpoint] wrote {path}", flush=True)


def load_meta(path: str) -> Dict:
    """Read only a checkpoint's JSON meta header (no payload parse)."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an imagecfgen-tpu checkpoint")
        _version, meta_len = struct.unpack("<II", f.read(8))
        return json.loads(f.read(meta_len).decode("utf-8"))


def load_resume(path: str, template: Dict, rng_template: Any = None):
    """Template-typed load for ``--resume``: optax optimizer states only
    deserialize structurally through flax ``from_bytes``, so callers pass
    a template built from a freshly-initialised train state. The per-step
    noise stream (``rng``) is included when the checkpoint carries it
    (``carries_rng`` meta flag; files written before the flag get one raw
    parse to check)."""
    meta = load_meta(path)
    has_rng = meta.get("carries_rng")
    if has_rng is None and rng_template is not None:
        raw, _ = load_checkpoint(path)
        has_rng = "rng" in raw
    template = dict(template)
    if rng_template is not None and has_rng:
        template["rng"] = rng_template
    return load_checkpoint(path, like=template)


def load_checkpoint(path: str, like: Any = None):
    """Read a checkpoint. With ``like`` (a template pytree) the result has
    the template's exact structure/dtypes; without it, returns the raw
    nested dict/list structure.

    Multi-GB loads get the same heartbeat as saves: ``msgpack_restore`` of
    an 8.3 GB ESRF payload is minutes of silent CPU with no process IO
    once the file is in page cache — exactly the signature the
    tools/tpu_stage.sh stall watchdog kills (it killed a healthy ESRF
    quality run there; the save side was fixed in round 3, the load side
    is this)."""
    verbose = os.path.getsize(path) >= (512 << 20)
    if verbose:
        print(f"[checkpoint] loading "
              f"{os.path.getsize(path) / 2**20:.0f} MB from {path}",
              flush=True)
    with _Heartbeat("parsing"), open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an imagecfgen-tpu checkpoint")
        version, meta_len = struct.unpack("<II", f.read(8))
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        payload = f.read()
        if like is not None:
            tree = serialization.from_bytes(like, payload)
        else:
            tree = restore_sequences(serialization.msgpack_restore(payload))
    if verbose:
        print(f"[checkpoint] loaded {path}", flush=True)
    return tree, meta


def restore_sequences(x):
    """flax msgpack encodes tuples/lists as {"0": ..., "1": ...} dicts;
    convert those back to tuples (our flow-chain params/state and MLP layer
    lists are positional — tuples satisfy both)."""
    if isinstance(x, dict):
        keys = list(x.keys())
        if keys and all(isinstance(k, str) and k.isdigit() for k in keys):
            return tuple(restore_sequences(x[str(i)]) for i in range(len(keys)))
        return {k: restore_sequences(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return tuple(restore_sequences(v) for v in x)
    return x
