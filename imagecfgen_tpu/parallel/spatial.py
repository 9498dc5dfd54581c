"""Spatial (height-sharded) convolution via shard_map + halo exchange.

The only context-parallel analog this workload admits (SURVEY §2.10 /
§5): the 512^2 ESRF activations are the one place where a single chip's
HBM could pinch at large batch, and the fix is to shard the *spatial*
height axis across the mesh and exchange k-1 halo rows with neighbours
over ICI (``lax.ppermute``) before each conv. This module provides that
primitive plus a sharded conv stack runner; it is optional (data
parallelism is the load-bearing strategy) but keeps the collective
pattern first-class and tested on the virtual CPU mesh.

Supports stride 1 and stride 2 with 'torch-style' symmetric padding p,
requiring the per-device height and the stride to divide evenly — the
ESRF/whale stacks (k5 s2 p1 on power-of-two sizes) satisfy this.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.conv import conv2d

SPACE_AXIS = "space"


def _halo_exchange(x: jnp.ndarray, lo: int, hi: int, axis_name: str) -> jnp.ndarray:
    """Concatenate ``lo`` rows from the previous device and ``hi`` rows from
    the next device onto this shard (zero rows at the mesh edges)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if lo > 0:
        prev = jax.lax.ppermute(
            x[:, -lo:], axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
        parts.append(prev)
    parts.append(x)
    if hi > 0:
        nxt = jax.lax.ppermute(
            x[:, :hi], axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        nxt = jnp.where(idx == n - 1, jnp.zeros_like(nxt), nxt)
        parts.append(nxt)
    return jnp.concatenate(parts, axis=1)


def sharded_conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int,
    padding: int,
    axis_name: str = SPACE_AXIS,
) -> jnp.ndarray:
    """Height-sharded conv: ``x`` is the local (B, H_local, W, C) shard.

    Requires H_local % stride == 0 and the global H to divide evenly over
    the mesh. Interior devices receive real halo rows; edge devices get the
    zero padding a global conv would see.
    """
    k = w.shape[0]
    # global row index of local output row 0 is (H_local/stride)*idx*stride;
    # output row o reads input rows [o*stride - padding, o*stride - padding + k).
    lo = padding
    hi = k - 1 - padding
    xh = _halo_exchange(x, lo, hi, axis_name)
    # after the exchange the first needed input row sits at offset 0
    return conv2d(xh, w, stride=(stride, stride), padding=(0, padding))


def make_spatial_conv(mesh: Mesh, stride: int, padding: int, kernel: int = None):
    """Jitted height-sharded conv over ``mesh`` (axis 'space'):
    inputs sharded P(None, 'space'), weights replicated. When ``kernel``
    is given, the seamless-tiling condition is validated eagerly."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if kernel is not None:
        if stride > 1 and kernel - 2 * padding != stride:
            raise ValueError(
                f"conv k={kernel} s={stride} p={padding} does not tile evenly "
                "across height shards (need kernel - 2*padding == stride)"
            )
        if stride == 1 and kernel != 2 * padding + 1:
            # stride 1 emits H_local rows per shard; that equals a global
            # conv (H + 2p - k + 1 rows with matching edge padding) only
            # for odd 'same' kernels. Other shapes would silently disagree.
            raise ValueError(
                f"conv k={kernel} s=1 p={padding} does not tile evenly "
                "across height shards (need kernel == 2*padding + 1)"
            )

    fn = shard_map(
        partial(sharded_conv2d, stride=stride, padding=padding, axis_name=SPACE_AXIS),
        mesh=mesh,
        in_specs=(P(None, SPACE_AXIS, None, None), P()),
        out_specs=P(None, SPACE_AXIS, None, None),
    )
    return jax.jit(fn)
