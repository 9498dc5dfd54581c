"""Typed attribute specifications.

The reference re-declares its attribute layout (one-hot digit + named
continuous columns, categorical embedding dims, min/max scaling stats) in
every model file and ~20 scripts (e.g. ``image_scms/mnist.py:12-18,197-208``,
``image_scms/audio_mnist.py:23-30``, ``train_mnist_image_scm.py:39-50`` in the
reference tree).  Here a single :class:`AttributeSpec` drives conditioning
channels, embeddings, scaling and (de)serialisation for every model family.

Conventions (stable under jit):

- a *batch of attributes* is a ``dict[str, jnp.ndarray]``;
- categorical attributes are stored **one-hot** ``(B, n)`` float arrays (the
  reference keeps one-hot digits everywhere and argmaxes when it needs the
  index);
- continuous attributes are ``(B,)`` or ``(B, 1)`` float arrays;
- iteration order is always ``sorted(names)`` — the same contract the
  reference relies on (``image_scms/mnist.py:53-55``), which makes dict
  conditioning safe under tracing.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Attribute:
    """One named attribute: categorical with ``n_categories`` or continuous."""

    name: str
    n_categories: int = 0  # 0 -> continuous scalar

    @property
    def is_categorical(self) -> bool:
        return self.n_categories > 0


@dataclasses.dataclass(frozen=True)
class AttributeSpec:
    """An ordered collection of attributes describing a conditioning dict."""

    attributes: Tuple[Attribute, ...]

    @staticmethod
    def create(**kwargs: int) -> "AttributeSpec":
        """``AttributeSpec.create(digit=10, thickness=0, ...)`` — value is the
        number of categories, 0 meaning continuous."""
        attrs = tuple(Attribute(k, v) for k, v in sorted(kwargs.items()))
        return AttributeSpec(attrs)

    def __iter__(self):
        return iter(self.attributes)

    def __len__(self):
        return len(self.attributes)

    @property
    def names(self) -> Tuple[str, ...]:
        return tuple(a.name for a in self.attributes)

    @property
    def categorical(self) -> Tuple[Attribute, ...]:
        return tuple(a for a in self.attributes if a.is_categorical)

    @property
    def continuous(self) -> Tuple[Attribute, ...]:
        return tuple(a for a in self.attributes if not a.is_categorical)

    def __getitem__(self, name: str) -> Attribute:
        for a in self.attributes:
            if a.name == name:
                return a
        raise KeyError(name)

    def validate(self, attrs: Mapping[str, jnp.ndarray]) -> None:
        for a in self.attributes:
            if a.name not in attrs:
                raise KeyError(f"missing attribute {a.name!r}")
            v = attrs[a.name]
            if a.is_categorical and v.shape[-1] != a.n_categories:
                raise ValueError(
                    f"{a.name}: expected one-hot width {a.n_categories}, got {v.shape}"
                )


class AttributeScaler:
    """Min/max scaling of continuous attributes to [-1, 1].

    Mirrors the per-epoch ``attr_stats`` idiom of the reference train loops
    (``image_scms/mnist.py:197-208``): continuous attributes are affinely
    mapped by their training min/max; categorical attributes pass through.
    Stats are plain numpy so they serialise with checkpoints.
    """

    def __init__(self, spec: AttributeSpec, mins: Dict[str, np.ndarray], maxs: Dict[str, np.ndarray]):
        self.spec = spec
        self.mins = {k: np.asarray(v, np.float32) for k, v in mins.items()}
        self.maxs = {k: np.asarray(v, np.float32) for k, v in maxs.items()}

    @staticmethod
    def fit(spec: AttributeSpec, attrs: Mapping[str, np.ndarray]) -> "AttributeScaler":
        mins, maxs = {}, {}
        for a in spec.continuous:
            v = np.asarray(attrs[a.name])
            mins[a.name] = v.min(axis=0)
            maxs[a.name] = v.max(axis=0)
        return AttributeScaler(spec, mins, maxs)

    def scale(self, attrs: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(attrs)
        for a in self.spec.continuous:
            lo, hi = self.mins[a.name], self.maxs[a.name]
            out[a.name] = 2.0 * (attrs[a.name] - lo) / (hi - lo) - 1.0
        return out

    def unscale(self, attrs: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(attrs)
        for a in self.spec.continuous:
            lo, hi = self.mins[a.name], self.maxs[a.name]
            out[a.name] = (attrs[a.name] + 1.0) / 2.0 * (hi - lo) + lo
        return out

    def state_dict(self) -> Dict[str, Dict[str, np.ndarray]]:
        return {"mins": dict(self.mins), "maxs": dict(self.maxs)}

    @staticmethod
    def from_state_dict(spec: AttributeSpec, state: Mapping) -> "AttributeScaler":
        return AttributeScaler(spec, dict(state["mins"]), dict(state["maxs"]))


def one_hot(labels: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.asarray(labels[..., None] == jnp.arange(n), jnp.float32)


def split_columns(a: np.ndarray, spec: AttributeSpec, layout: Sequence[Tuple[str, int]]):
    """Split a column-packed attribute matrix (e.g. the 13-column MNIST layout
    ``[one-hot digit(10), thickness, intensity, slant]`` produced by dataset
    synthesis — reference ``create_train_dataset.py:88-92``) into the dict
    form used everywhere in this framework.

    ``layout`` is a list of (name, width) pairs in column order.
    """
    out: Dict[str, np.ndarray] = {}
    i = 0
    for name, width in layout:
        col = a[:, i : i + width]
        out[name] = col if width > 1 else col[:, 0]
        i += width
    return out


MNIST_LAYOUT: Tuple[Tuple[str, int], ...] = (
    ("digit", 10),
    ("thickness", 1),
    ("intensity", 1),
    ("slant", 1),
)

MNIST_SPEC = AttributeSpec.create(digit=10, thickness=0, intensity=0, slant=0)


def pack_mnist_attrs(attrs: Mapping[str, np.ndarray]) -> np.ndarray:
    """Inverse of :func:`split_columns` for the 13-column MNIST layout."""
    cols = [np.asarray(attrs["digit"], np.float32).reshape(-1, 10)]
    for name in ("thickness", "intensity", "slant"):
        cols.append(np.asarray(attrs[name], np.float32).reshape(-1, 1))
    return np.concatenate(cols, axis=1)
