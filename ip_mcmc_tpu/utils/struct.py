"""Tiny pytree-dataclass helper (pure JAX, no flax dependency in the core).

``pytree_dataclass`` = frozen dataclass + ``jax.tree_util.register_dataclass``
with every field treated as a pytree child. Used for sampler states,
distributions, and info records so they flow through ``jit``/``vmap``/``scan``
untouched.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are treated as static (hashable, part of treedef) —
    use for python ints/strings that must not be traced.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **changes):
    """dataclasses.replace that works through the frozen pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
