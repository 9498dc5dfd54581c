"""core/checkpoint: pytree round-trip, header meta, and the resume loader."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagecfgen_tpu.core.checkpoint import (
    load_checkpoint,
    load_meta,
    load_resume,
    save_checkpoint,
)


def _opt_state():
    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    return params, tx.init(params), tx


def test_roundtrip_and_meta(tmp_path):
    p = str(tmp_path / "ck.tar")
    params, opt, _ = _opt_state()
    save_checkpoint(p, {"params": params, "opt": opt}, meta={"kind": "t", "epoch": 3})
    assert load_meta(p) == {"kind": "t", "epoch": 3}
    raw, meta = load_checkpoint(p)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(raw["params"]["w"], np.ones((3, 2)))


def test_template_load_restores_optax_structure(tmp_path):
    """Raw msgpack turns optax NamedTuples into plain tuples; the template
    path must give back structures tx.update accepts."""
    p = str(tmp_path / "ck.tar")
    params, opt, tx = _opt_state()
    save_checkpoint(p, {"params": params, "opt": opt}, meta={})
    raw, _ = load_checkpoint(p)
    with pytest.raises(AttributeError):
        tx.update(params, raw["opt"], params)  # plain tuples: no .count etc.
    tree, _ = load_checkpoint(p, like={"params": params, "opt": opt})
    updates, _ = tx.update(params, tree["opt"], params)  # structural: works
    assert set(updates) == {"w", "b"}


def test_load_resume_rng_flag_paths(tmp_path):
    params, opt, _ = _opt_state()
    rng = jax.random.PRNGKey(7)
    template = {"params": params, "opt": opt}

    # flagged checkpoint: rng restored without a raw pre-parse
    p1 = str(tmp_path / "with_rng.tar")
    save_checkpoint(p1, {"params": params, "opt": opt, "rng": rng},
                    meta={"carries_rng": True, "epoch": 5})
    tree, meta = load_resume(p1, template, rng_template=rng)
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(tree["rng"], np.asarray(rng))

    # flagged absent: template must NOT grow an rng key
    p2 = str(tmp_path / "no_rng.tar")
    save_checkpoint(p2, {"params": params, "opt": opt},
                    meta={"carries_rng": False})
    tree, _ = load_resume(p2, template, rng_template=rng)
    assert "rng" not in tree

    # legacy (no flag): falls back to one raw parse to detect rng
    p3 = str(tmp_path / "legacy.tar")
    save_checkpoint(p3, {"params": params, "opt": opt, "rng": rng}, meta={})
    tree, _ = load_resume(p3, template, rng_template=rng)
    np.testing.assert_array_equal(tree["rng"], np.asarray(rng))
    p4 = str(tmp_path / "legacy_no_rng.tar")
    save_checkpoint(p4, {"params": params, "opt": opt}, meta={})
    tree, _ = load_resume(p4, template, rng_template=rng)
    assert "rng" not in tree


def test_fetch_tree_matches_device_get():
    """Chunked device->host fetch (used by save_checkpoint to avoid the
    monolithic-transfer tunnel stall) is value- and dtype-identical to a
    plain jax.device_get, across small leaves, chunk-spanning leaves,
    rows wider than the chunk size, scalars, and non-array leaves."""
    from imagecfgen_tpu.core.checkpoint import fetch_tree

    key = jax.random.PRNGKey(0)
    tree = {
        "small": jnp.arange(7, dtype=jnp.float32),
        "big": jax.random.normal(key, (64, 33)),        # many chunks at 256 B
        "wide_row": jax.random.normal(key, (3, 200)),   # one row > chunk
        "scalar": jnp.float32(3.5),
        "bf16": jax.random.normal(key, (16, 9)).astype(jnp.bfloat16),
        "host": np.ones((2, 2)),
        "plain": 5,
    }
    got = fetch_tree(tree, chunk_bytes=256, progress_bytes=1 << 40)
    want = jax.device_get(tree)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
        if hasattr(want[k], "dtype"):
            assert np.asarray(got[k]).dtype == np.asarray(want[k]).dtype, k


def test_fetch_tree_sharded_array():
    """fetch_tree must also handle mesh-sharded leaves (the data-parallel
    trainers checkpoint states whose arrays live on all 8 virtual devices)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from imagecfgen_tpu.core.checkpoint import fetch_tree

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    x = jnp.arange(8 * 13 * 5, dtype=jnp.float32).reshape(8 * 13, 5)
    sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    repl = jax.device_put(x, NamedSharding(mesh, P()))
    got = fetch_tree({"s": sharded, "r": repl}, chunk_bytes=128)
    np.testing.assert_array_equal(got["s"], np.asarray(x))
    np.testing.assert_array_equal(got["r"], np.asarray(x))
