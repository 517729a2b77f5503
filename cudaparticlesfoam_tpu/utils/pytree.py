"""Dataclass-as-pytree helper."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashed into the treedef, trigger recompile on
    change); everything else is a traced array leaf.
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
