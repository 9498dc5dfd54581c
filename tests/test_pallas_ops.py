"""Correctness tests for the Pallas kernels (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecfgen_tpu.ops.pallas.fused_dense import fused_dense_lrelu


def _ref(x, w, b, slope=0.2):
    out = x @ w + b[None, :]
    return jnp.where(out >= 0, out, slope * out)


def test_fused_dense_lrelu_matches_reference_interpret():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    m, k, n = 128, 512, 512
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.02
    b = jax.random.normal(k3, (n,), jnp.float32)

    out = fused_dense_lrelu(x, w, b, 0.2, True)  # interpret mode
    ref = _ref(x, w, b)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_fused_dense_multi_k_tiles_interpret():
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    m, k, n = 128, 2048, 512  # 4 K-tiles exercises the accumulator loop
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.02
    b = jnp.zeros((n,))
    out = fused_dense_lrelu(x, w, b, 0.2, True)
    ref = _ref(x, w, b)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=2e-3)


def test_fused_dense_gradients_match():
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    m, k, n = 128, 512, 512
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.02
    b = jax.random.normal(k3, (n,), jnp.float32)

    def loss_fused(x, w, b):
        return (fused_dense_lrelu(x, w, b, 0.2, True) ** 2).mean()

    def loss_ref(x, w, b):
        return (_ref(x, w, b) ** 2).mean()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(gf, gr):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=2e-3)


def test_fused_dense_fallback_on_unaligned_shapes():
    # 100 is not MXU-aligned: must fall back to the XLA path and still be correct
    x = jax.random.normal(jax.random.PRNGKey(3), (100, 300))
    w = jax.random.normal(jax.random.PRNGKey(4), (300, 200)) * 0.02
    b = jnp.zeros((200,))
    out = fused_dense_lrelu(x, w, b)
    assert np.allclose(np.asarray(out), np.asarray(_ref(x, w, b)), atol=1e-4)


# ---------------------------------------------------------- fused encoder


def _mnist_trunk_params(seed=0):
    from imagecfgen_tpu.models.bigan import mnist_bigan_config

    plan = mnist_bigan_config().enc_plan
    rng = np.random.default_rng(seed)
    c_in, params, i = 5, {}, 0
    for op in plan:
        if op[0] != "conv":
            continue
        ch, k = op[1], op[2]
        params[f"conv_{i}_kernel"] = jnp.asarray(
            rng.normal(0, 0.05, (k, k, c_in, ch)).astype(np.float32))
        params[f"conv_{i}_bias"] = jnp.asarray(
            rng.normal(0, 0.05, ch).astype(np.float32))
        c_in, i = ch, i + 1
    return plan, params


@pytest.mark.parametrize("split", [0, 2])
def test_fused_encoder_matches_xla(split):
    """The fused 28^2 encoder kernel (interpret mode) reproduces the XLA
    conv stack, both fully fused and with low-channel layers split off."""
    from imagecfgen_tpu.ops.pallas.fused_encoder import (
        _xla_reference,
        fused_encoder_forward,
        plan_conv_ops,
    )

    plan, params = _mnist_trunk_params()
    conv_ops = plan_conv_ops(plan)
    pairs = [(params[f"conv_{j}_kernel"], params[f"conv_{j}_bias"])
             for j in range(len(conv_ops))]
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(0, 1, (32, 28, 28, 5)).astype(np.float32))
    ref = _xla_reference(feats, pairs, conv_ops)
    out = fused_encoder_forward(params, feats, plan, batch_tile=16,
                                split=split, interpret=True)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=2e-4), np.abs(
        np.asarray(ref) - np.asarray(out)).max()


def test_fused_encoder_fallback_off_tpu():
    from imagecfgen_tpu.ops.pallas.fused_encoder import (
        _xla_reference,
        fused_encoder_forward,
        plan_conv_ops,
    )

    plan, params = _mnist_trunk_params()
    conv_ops = plan_conv_ops(plan)
    pairs = [(params[f"conv_{j}_kernel"], params[f"conv_{j}_bias"])
             for j in range(len(conv_ops))]
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(0, 1, (8, 28, 28, 5)).astype(np.float32))
    out = fused_encoder_forward(params, feats, plan)  # cpu backend -> XLA
    assert np.allclose(np.asarray(out),
                       np.asarray(_xla_reference(feats, pairs, conv_ops)),
                       atol=1e-5)
