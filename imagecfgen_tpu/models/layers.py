"""Layer library: a tiny sequential-plan DSL plus attribute conditioning.

The reference implements four near-identical E/G/D conv stacks, one per data
domain (28^2 ``image_scms/mnist.py``, 128^2 ``image_scms/audio_mnist.py``,
256^2 ``image_scms/whalecalls.py``, 512^2 ``image_scms/esrf_acoustic.py``).
Here every stack is a *plan*: a tuple of op descriptors interpreted by
:class:`PlanSequential`, so each domain is pure data (see
``models/bigan.py``) and there is exactly one implementation of conv blocks,
channel dropout, batch norm and attribute conditioning.

Plan ops (all shapes NHWC):

- ``("conv",  features, kernel, stride, padding)``
- ``("convT", features, kernel, stride, padding)``  (out = (i-1)s - 2p + k)
- ``("lrelu", slope)``
- ``("tanh",)`` / ``("sigmoid",)``
- ``("bn",)``            batch norm over N,H,W (torch BatchNorm2d semantics)
- ``("drop2d", rate)``   channel dropout (torch Dropout2d semantics)
- ``("drop", rate)``     element dropout
- ``("dense", features)``
- ``("flatten",)`` / ``("reshape", (h, w, c))``
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.attributes import AttributeSpec
from ..ops.conv import conv2d, conv_transpose2d

Plan = Tuple[Tuple[Any, ...], ...]


def conv_kernel_init(std):
    """N(0, std) conv init, zero bias — reference ``init_weights``
    (``image_scms/training_utils.py:114-119``; std is 0.01 for MNIST, 0.001
    for the audio domains, 1e-4 for the VAEs). ``std=None`` selects a
    fan-in-scaled default (for models the reference leaves at torch
    defaults, e.g. the classifiers)."""
    if std is None:
        return nn.initializers.lecun_normal()
    return nn.initializers.normal(stddev=std)


class PlanSequential(nn.Module):
    """Interpret a plan of op descriptors as a sequential network."""

    plan: Plan
    init_std: Any = 0.01  # float, or None for fan-in default
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        import os

        use_pallas = os.environ.get("IMAGECFGEN_PALLAS", "1") != "0"
        x = x.astype(self.compute_dtype)
        conv_i = bn_i = dense_i = 0
        skip_next = False
        for idx, op in enumerate(self.plan):
            if skip_next:
                skip_next = False
                continue
            kind = op[0]
            # peephole: dense followed by lrelu -> Pallas fused matmul with
            # the bias+activation epilogue in the output tiles (falls back
            # to XLA off-TPU / on unaligned shapes)
            if (
                kind == "dense"
                and use_pallas
                and idx + 1 < len(self.plan)
                and self.plan[idx + 1][0] == "lrelu"
            ):
                from ..ops.pallas.fused_dense import fused_dense_lrelu

                feats = op[1]
                kernel = self.param(
                    f"dense_{dense_i}_kernel",
                    nn.initializers.lecun_normal(),
                    (x.shape[-1], feats),
                    jnp.float32,
                )
                bias = self.param(
                    f"dense_{dense_i}_bias", nn.initializers.zeros, (feats,), jnp.float32
                )
                x = fused_dense_lrelu(
                    x.astype(self.compute_dtype),
                    kernel.astype(self.compute_dtype),
                    bias.astype(self.compute_dtype),
                    self.plan[idx + 1][1],
                )
                dense_i += 1
                skip_next = True
                continue
            if kind == "conv" or kind == "convT":
                feats, k, s, p = op[1], op[2], op[3], op[4]
                kh, kw = (k, k) if isinstance(k, int) else k
                kernel = self.param(
                    f"{kind}_{conv_i}_kernel",
                    conv_kernel_init(self.init_std),
                    (kh, kw, x.shape[-1], feats),
                    jnp.float32,
                )
                bias = self.param(
                    f"{kind}_{conv_i}_bias", nn.initializers.zeros, (feats,), jnp.float32
                )
                kernel = kernel.astype(self.compute_dtype)
                bias = bias.astype(self.compute_dtype)
                # activations stay in the compute dtype end to end (bf16
                # halves HBM traffic; the MXU accumulates f32 internally)
                if kind == "conv":
                    x = conv2d(x, kernel, s, p) + bias
                else:
                    outpad = op[5] if len(op) > 5 else 0
                    x = conv_transpose2d(x, kernel, s, p, output_padding=outpad) + bias
                conv_i += 1
            elif kind == "lrelu":
                x = nn.leaky_relu(x, negative_slope=op[1])
            elif kind == "tanh":
                x = jnp.tanh(x)
            elif kind == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif kind == "bn":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.compute_dtype,
                    name=f"bn_{bn_i}",
                )(x)
                bn_i += 1
            elif kind == "drop2d":
                x = channel_dropout(self, x, rate=op[1], deterministic=not train)
            elif kind == "drop":
                x = nn.Dropout(rate=op[1], deterministic=not train)(x)
            elif kind == "dense":
                # same param naming as the fused path so the checkpoint
                # layout is independent of the IMAGECFGEN_PALLAS toggle
                kernel = self.param(
                    f"dense_{dense_i}_kernel",
                    nn.initializers.lecun_normal(),
                    (x.shape[-1], op[1]),
                    jnp.float32,
                )
                bias = self.param(
                    f"dense_{dense_i}_bias", nn.initializers.zeros, (op[1],), jnp.float32
                )
                x = (
                    jnp.dot(x, kernel.astype(self.compute_dtype))
                    + bias.astype(self.compute_dtype)
                )
                dense_i += 1
            elif kind == "flatten":
                x = x.reshape((x.shape[0], -1))
            elif kind == "reshape":
                h, w, c = op[1]
                x = x.reshape((x.shape[0], h, w, c))
            else:
                raise ValueError(f"unknown plan op {op!r}")
        return x


def channel_dropout(mod: nn.Module, x: jnp.ndarray, rate: float, deterministic: bool):
    """Drop whole channels (torch ``Dropout2d``) with 1/(1-p) rescale."""
    if deterministic or rate == 0.0:
        return x
    rng = mod.make_rng("dropout")
    keep = jax.random.bernoulli(rng, 1.0 - rate, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class AttributeChannels(nn.Module):
    """Render a conditioning dict as image channels (encoder/discriminator
    side).

    Categorical attributes: Embed(n, embed_dim) -> reshape (eh, ew) ->
    nearest-resize to the image size -> tanh, one channel each (the
    reference's ``digit_embedding`` head, ``image_scms/mnist.py:24-29``).
    Continuous attributes: constant channel (``continuous_feature_map``,
    ``image_scms/mnist.py:17-18``).  Channels are appended in sorted-name
    order with categorical embeddings first, matching the reference concat
    contract (``image_scms/mnist.py:53-55``).
    """

    spec: AttributeSpec
    image_size: Tuple[int, int]
    embed_dim: int = 256
    embed_hw: Tuple[int, int] = (16, 16)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attrs: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        h, w = self.image_size
        b = x.shape[0]
        chans = [x.astype(self.compute_dtype)]
        for a in self.spec.categorical:
            emb = nn.Embed(
                a.n_categories,
                self.embed_dim,
                embedding_init=nn.initializers.normal(1.0),
                name=f"embed_{a.name}",
            )
            idx = jnp.argmax(attrs[a.name], axis=-1)
            m = emb(idx).reshape((b, *self.embed_hw, 1))
            # nearest upsample with torch semantics (out[i] = in[floor(i*S/T)])
            eh, ew = self.embed_hw
            rows = (jnp.arange(h) * eh) // h
            cols = (jnp.arange(w) * ew) // w
            m = m[:, rows][:, :, cols]
            chans.append(jnp.tanh(m).astype(self.compute_dtype))
        for a in self.spec.continuous:
            v = attrs[a.name].reshape((b, 1, 1, 1)).astype(self.compute_dtype)
            chans.append(jnp.broadcast_to(v, (b, h, w, 1)))
        return jnp.concatenate(chans, axis=-1)


class AttributeVectors(nn.Module):
    """Render a conditioning dict as a flat feature vector (generator side).

    Categorical attributes are a *soft* matmul ``one_hot @ embedding`` so
    convex mixtures of classes flow through the decoder — the property the
    CF explainers rely on (reference ``image_scms/mnist.py:77``,
    ``explain/cf_example.py:44-50``).  Continuous attributes contribute one
    scalar each.  Order: categorical embeddings then continuous scalars, in
    sorted-name order.
    """

    spec: AttributeSpec
    embed_dim: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, attrs: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
        feats = []
        for a in self.spec.categorical:
            table = self.param(
                f"embed_{a.name}",
                nn.initializers.normal(1.0),
                (a.n_categories, self.embed_dim),
                jnp.float32,
            )
            feats.append(
                attrs[a.name].astype(self.compute_dtype) @ table.astype(self.compute_dtype)
            )
        for a in self.spec.continuous:
            feats.append(attrs[a.name].reshape((-1, 1)).astype(self.compute_dtype))
        return jnp.concatenate(feats, axis=-1)
