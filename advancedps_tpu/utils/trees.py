"""Pytree dataclass helper.

Every object that crosses a ``jax.jit`` / ``lax.scan`` boundary in this framework
(distributions, model components, sweep state) is a frozen dataclass registered as a
JAX pytree.  Fields marked ``static=True`` become auxiliary (hashable, trace-time)
data; everything else is a leaf that may hold arrays.

This replaces the reference's mutable Julia structs (e.g. ``Trace``
``/root/reference/src/model.jl:4-7``) with immutable, functionally-updated pytrees —
the idiomatic JAX representation.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs):
    """Declare a dataclass field as static (pytree aux data, not a traced leaf)."""
    metadata = dict(kwargs.pop("metadata", ()) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` are treated as static metadata;
    all other fields are pytree children.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def replace(obj: _T, **changes) -> _T:
    """Functional field update for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
