"""Pallas TPU kernel: the whole 28^2 BiGAN encoder forward, fused.

The honest round-2 profile (docs/PERF.md) showed the MNIST models spend
their time in ~hundreds of tiny XLA kernels — each 28^2 conv is far below
MXU-efficient tile sizes, so per-kernel fixed costs dominate. This kernel
collapses the encoder's full conv stack (reference channel plan
``image_scms/mnist.py:30-40``: 5ch -> 64 -> 128 -> 256 -> 512 -> latent,
strides 2) into ONE Pallas program per batch tile:

- all five weight tensors live in VMEM for the whole kernel (~12 MB f32 at
  latent 512 — under the ~16 MB/core budget with a 64-row batch tile);
- each strided conv is computed as K*K MXU matmuls over parity-reshaped
  slices of the zero-padded input (stride-2 == even/odd row interleave, so
  no strided memory access is needed);
- LeakyReLU epilogues happen in registers between layers — intermediate
  activations never touch HBM.

Inference-path kernel (abduct/CF engine, scoring): gradients fall back to
XLA via ``jax.custom_vjp`` is NOT provided — training uses the XLA path.
Falls back to XLA on non-TPU backends or non-matching plans.

Use ``fused_encoder_forward(params, feats, plan)`` with the params of a
``models.bigan.Encoder`` trunk (PlanSequential naming) and the
pre-concatenated attribute-channel features.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _conv_block(x, w, b, stride, pad, slope):
    """One strided conv + optional LeakyReLU on VMEM-resident values.

    x: (TB, H, W, C) f32/bf16; w: (K, K, C, Cout); returns (TB, OH, OW, Cout).
    Stride must be 1 or 2; stride-2 slices use the parity-reshape trick.
    """
    tb, h, wdt, c = x.shape
    k = w.shape[0]
    cout = w.shape[3]
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wdt + 2 * pad - k) // stride + 1

    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, wdt + 2 * pad
    if stride == 2:
        # pad spatial dims to even so (H, W) -> (H/2, 2, W/2, 2) reshapes
        eh, ew = hp + (hp % 2), wp + (wp % 2)
        if (eh, ew) != (hp, wp):
            x = jnp.pad(x, ((0, 0), (0, eh - hp), (0, ew - wp), (0, 0)))
        xr = x.reshape(tb, eh // 2, 2, ew // 2, 2, c)

    def tap(kh, kw):
        if stride == 2:
            return xr[:, kh // 2 : kh // 2 + oh, kh % 2,
                      kw // 2 : kw // 2 + ow, kw % 2, :]
        return x[:, kh : kh + oh, kw : kw + ow, :]

    # per-tap matmuls: K*K dots of (TB*OH*OW, C) @ (C, Cout). Mosaic pads
    # the C contraction dim to 128 lanes, so low-channel layers waste MXU
    # work; a single-im2col variant would fix that, but Mosaic cannot yet
    # concatenate non-128-aligned pieces on the lane dim ("result/input
    # offset mismatch on non-concat dimension") — keep taps and split
    # low-channel layers off to XLA instead (fused_encoder_forward(split=)).
    acc = jnp.zeros((tb * oh * ow, cout), jnp.float32)
    for kh in range(k):
        for kw in range(k):
            acc += jnp.dot(
                tap(kh, kw).reshape(tb * oh * ow, c), w[kh, kw],
                preferred_element_type=jnp.float32,
            )
    out = acc + b[None, :]
    if slope is not None:
        out = jnp.where(out >= 0, out, slope * out)
    return out.reshape(tb, oh, ow, cout).astype(x.dtype)


def _encoder_kernel(x_ref, *refs, conv_ops):
    """refs = (w1, b1, ..., wn, bn, out_ref)."""
    out_ref = refs[-1]
    x = x_ref[:]
    for i, (stride, pad, slope) in enumerate(conv_ops):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        x = _conv_block(x, w, b, stride, pad, slope)
    out_ref[:] = x.reshape(out_ref.shape)


def plan_conv_ops(plan) -> Tuple[Tuple[int, int, object], ...]:
    """Extract ((stride, pad, lrelu_slope|None), ...) from a conv-only
    PlanSequential plan; raises if the plan has non-conv/lrelu ops."""
    ops = []
    pending = None
    for op in plan:
        if op[0] == "conv":
            if pending is not None:
                ops.append(pending)
            pending = (op[3], op[4], None)
        elif op[0] == "lrelu":
            if pending is None:
                raise ValueError("lrelu before first conv")
            pending = (pending[0], pending[1], float(op[1]))
        else:
            raise ValueError(f"unsupported op for fused encoder: {op[0]}")
    if pending is not None:
        ops.append(pending)
    return tuple(ops)


def _xla_reference(feats, weights, conv_ops):
    from ..conv import conv2d

    x = feats
    for (stride, pad, slope), (w, b) in zip(conv_ops, weights):
        x = conv2d(x, w, stride=stride, padding=pad) + b
        if slope is not None:
            x = jnp.where(x >= 0, x, slope * x)
    return x.reshape(x.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("conv_ops", "batch_tile", "interpret"))
def _pallas_encoder(feats, flat_weights, conv_ops, batch_tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = feats.shape[0]
    h, wdt, c = feats.shape[1:]
    # output dim from the last conv
    latent = flat_weights[-2].shape[-1]
    kernel = functools.partial(_encoder_kernel, conv_ops=conv_ops)
    grid = (b // batch_tile,)
    in_specs = [
        pl.BlockSpec((batch_tile, h, wdt, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    for wgt in flat_weights:
        in_specs.append(
            pl.BlockSpec(wgt.shape, lambda i, nd=wgt.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
    kwargs = {}
    if not interpret:
        # the weight blocks alone exceed the default 16 MB scoped-VMEM
        # budget (they are grid-invariant but still counted); v5e has
        # 128 MB of VMEM, so raise the cap for this kernel
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((batch_tile, latent), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, latent), feats.dtype),
        interpret=interpret,
        **kwargs,
    )(feats, *flat_weights)


def trunk_weights(trunk_params) -> Sequence[jnp.ndarray]:
    """Flatten PlanSequential conv params (conv_i_kernel / conv_i_bias) in
    layer order."""
    out = []
    i = 0
    while f"conv_{i}_kernel" in trunk_params:
        out.append(trunk_params[f"conv_{i}_kernel"])
        out.append(trunk_params[f"conv_{i}_bias"])
        i += 1
    return out


def fused_encoder_forward(
    trunk_params,
    feats: jnp.ndarray,
    plan,
    batch_tile: int = 16,
    split: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused conv-stack forward: (B, H, W, C) features -> (B, latent).

    ``trunk_params``: the Encoder's "trunk" param dict; ``plan``: the
    matching conv plan (e.g. ``mnist_bigan_config().enc_plan``).
    ``split``: run the first ``split`` convs in XLA (low-channel layers
    waste MXU lanes inside the kernel) and fuse the rest. Falls back to
    the XLA path off-TPU or when the batch doesn't tile.
    """
    conv_ops = plan_conv_ops(plan)
    flat = trunk_weights(trunk_params)
    assert len(flat) == 2 * len(conv_ops), (len(flat), len(conv_ops))
    pairs = [(flat[2 * i], flat[2 * i + 1]) for i in range(len(conv_ops))]
    if not interpret and (
        jax.default_backend() != "tpu" or feats.shape[0] % batch_tile
    ):
        return _xla_reference(feats, pairs, conv_ops)
    if split:
        x = feats
        from ..conv import conv2d

        for (stride, pad, slope), (w, b) in zip(conv_ops[:split], pairs[:split]):
            x = conv2d(x, w, stride=stride, padding=pad) + b
            if slope is not None:
                x = jnp.where(x >= 0, x, slope * x)
        feats = x
        conv_ops, flat = conv_ops[split:], flat[2 * split:]
    return _pallas_encoder(feats, tuple(flat), conv_ops, batch_tile, interpret)
