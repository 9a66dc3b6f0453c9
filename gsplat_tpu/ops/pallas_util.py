"""Shared Pallas helpers."""
from __future__ import annotations

import jax


def vma_of(*operands) -> frozenset:
    """Union of the operands' varying-mesh-axes (vma).

    Inside ``shard_map`` (with the default ``check_vma=True``) every
    ``pallas_call`` out_shape must declare how its output varies across mesh
    axes; a kernel's output varies wherever any operand does.  Outside
    shard_map every vma is the empty frozenset, so this is a no-op there.
    """
    s = frozenset()
    for x in operands:
        s |= getattr(jax.typeof(x), "vma", frozenset())
    return s
