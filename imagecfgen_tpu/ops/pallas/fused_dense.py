"""Pallas TPU kernel: tiled matmul fused with bias + LeakyReLU.

The audio/whale/ESRF generators start with a large dense stem
(``Linear(latent + embeds -> 256*d)``, e.g. 2048 -> 16384 at d=64 —
reference ``image_scms/audio_mnist.py:226``) followed by an activation.
XLA emits matmul + a separate elementwise kernel; fusing the epilogue into
the matmul's output tiles keeps the (B, 16384) activation from making an
extra HBM round trip.

Design (see /opt/skills/guides/pallas_guide.md):

- grid over (M/BM, N/BN) output tiles; the K loop runs as the innermost
  grid dimension with a VMEM accumulator scratch, f32 accumulation on the
  MXU (``preferred_element_type``);
- bias add + LeakyReLU applied once, when the K loop finishes
  (``@pl.when(k == nk - 1)``);
- backward pass via ``jax.custom_vjp`` using plain XLA matmuls (the
  backward has no fusable epilogue, XLA is already optimal there).

The public entry point falls back to plain XLA on non-TPU backends and on
shapes that do not tile to the MXU (the guide's "fall back where Pallas
gains nothing" rule).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BM, BK, BN = 128, 512, 512


def _epilogue(acc, bias, slope):
    out = acc + bias[None, :]
    return jnp.where(out >= 0, out, slope * out)


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, slope, nk):
    from jax.experimental import pallas as pl

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = _epilogue(acc_ref[:], b_ref[0], slope).astype(o_ref.dtype)


def _pallas_forward(x, w, b, slope, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    _, n = w.shape
    nk = k // BK
    grid = (m // BM, n // BN, nk)
    kernel = functools.partial(_matmul_kernel, slope=slope, nk=nk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((BK, BN), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, BN), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        interpret=interpret,
    )(x, w, b.reshape(1, -1))


def _supported(x, w):
    return (
        x.ndim == 2
        and x.shape[0] % BM == 0
        and x.shape[1] % BK == 0
        and w.shape[1] % BN == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_dense_lrelu(x, w, b, slope: float = 0.2, interpret: bool = False):
    """``leaky_relu(x @ w + b)`` with the epilogue fused into the matmul.

    Falls back to XLA when shapes don't tile onto the MXU or when not on a
    TPU backend (unless ``interpret=True`` for testing).
    """
    if not interpret and (
        jax.default_backend() != "tpu" or not _supported(x, w)
    ):
        return _epilogue(
            jnp.dot(x, w, preferred_element_type=jnp.float32), b, slope
        ).astype(x.dtype)
    return _pallas_forward(x, w, b, slope, interpret=interpret)


def _fwd(x, w, b, slope, interpret):
    out = fused_dense_lrelu(x, w, b, slope, interpret)
    return out, (x, w, out)


def _bwd(slope, interpret, res, g):
    x, w, out = res
    # d/dz leaky_relu(z) = 1 if z >= 0 else slope; out >= 0 <=> z >= 0
    gz = jnp.where(out >= 0, g, slope * g).astype(g.dtype)
    dx = jnp.dot(gz, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.T, gz, preferred_element_type=jnp.float32).astype(w.dtype)
    db = gz.sum(axis=0).astype(g.dtype)
    return dx, dw, db


fused_dense_lrelu.defvjp(_fwd, _bwd)
