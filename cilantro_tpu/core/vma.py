"""Varying-manual-axes (vma) helpers for ``shard_map(check_vma=True)``.

Freshly created constants inside a checked ``shard_map`` body type as
*replicated*; before they can meet device-varying data in a ``scan`` carry
or ``while_loop`` state they must be cast varying, or JAX's vma type
checker (rightly) rejects the program. These helpers are no-ops outside
shard_map, so library code can use them unconditionally.
"""

from __future__ import annotations

import jax


def operand_vma(*operands) -> frozenset:
    """Union of the operands' varying mesh axes (empty outside shard_map)."""
    vma = frozenset()
    for o in jax.tree.leaves(operands):
        vma |= frozenset(getattr(jax.typeof(o), "vma", ()) or ())
    return vma


def match_vma(x, *operands):
    """Mark every leaf of ``x`` varying over the union of the operands'
    varying axes. No-op when the operands are unsharded/replicated."""
    vma = operand_vma(*operands)
    if not vma:
        return x
    return jax.tree.map(
        lambda a: jax.lax.pcast(a, tuple(vma), to="varying"), x
    )
