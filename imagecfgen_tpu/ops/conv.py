"""Strided conv / transposed-conv primitives, NHWC, MXU-friendly.

These are thin functional wrappers over ``lax.conv_general_dilated`` with the
exact output-size arithmetic of the reference's conv stacks (out =
floor((i + 2p - k)/s) + 1 for conv; out = (i-1)s - 2p + k for transposed
conv — the E/G/D channel plans in the reference depend on this arithmetic,
e.g. ``image_scms/mnist.py:30-40,63-74``).

Design notes (TPU-first):

- NHWC activations / HWIO weights: the layouts XLA:TPU tiles onto the MXU
  without transposes.
- Transposed conv is expressed as input-dilated conv (``lhs_dilation``),
  which XLA lowers to the same MXU matmuls as the backward pass of a conv —
  there is no separate "deconv" kernel to hand-write; the win on TPU is
  keeping everything as one fused XLA graph.
- ``preferred_element_type`` pins f32 accumulation so activations can be
  bf16 while partial sums stay f32 (MXU native mode).
"""
from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    accum_dtype=None,
) -> jnp.ndarray:
    """``y[n,h,w,o] = sum_{dh,dw,i} x[n, h*s+dh-p, w*s+dw-p, i] * w[dh,dw,i,o]``.

    ``accum_dtype=None`` keeps the output in the input dtype (the MXU still
    accumulates partials in f32 internally); forcing a wider output dtype
    breaks the conv transpose rule under autodiff with bf16 inputs (the
    cotangent arrives in the output dtype and the backward convs would mix
    dtypes).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=_DIMS,
        preferred_element_type=accum_dtype,
    )


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    output_padding: IntOr2 = 0,
    accum_dtype=None,
) -> jnp.ndarray:
    """Transposed conv, output size ``(i-1)*s - 2p + k + output_padding``.

    Implemented as a conv over the input dilated by ``s`` with edge padding
    ``k - 1 - p`` (plus ``output_padding`` on the high side) — functionally
    identical to a gradient-of-conv, and since this framework owns its
    parameterisation there is no kernel flip to track.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oh, ow = _pair(output_padding)
    kh, kw = w.shape[0], w.shape[1]
    if kh - 1 - ph < 0 or kw - 1 - pw < 0:
        raise ValueError("padding may not exceed kernel_size - 1")
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(kh - 1 - ph, kh - 1 - ph + oh), (kw - 1 - pw, kw - 1 - pw + ow)],
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMS,
        preferred_element_type=accum_dtype,
    )


def conv_out_size(i: int, k: int, s: int, p: int) -> int:
    return (i + 2 * p - k) // s + 1


def conv_transpose_out_size(i: int, k: int, s: int, p: int, op: int = 0) -> int:
    return (i - 1) * s - 2 * p + k + op
