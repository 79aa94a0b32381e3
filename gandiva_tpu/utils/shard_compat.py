"""shard_map compatibility helpers.

Under ``jax.shard_map`` every array carries a set of varying manual axes
(vma). A ``lax.while_loop``/``lax.scan`` whose carry mixes fresh constants
(axis-UNvarying: ``jnp.zeros`` tables, counters) with values derived from
sharded operands (axis-varying) fails type checking, because the loop body
promotes the constants on the first iteration. The fix is mechanical:
promote every carry leaf to the union of varying axes before entering the
loop. Promotion is a no-op outside shard_map, so call sites stay uniform.
"""
from __future__ import annotations

import jax
from jax import lax


def _vma_of(x):
    try:
        return set(jax.typeof(x).vma)
    except AttributeError:
        return set()


def promote_carry(init):
    """Promote every leaf of ``init`` to the union of the leaves' varying
    manual axes (no-op when the union is empty / outside shard_map)."""
    leaves = jax.tree_util.tree_leaves(init)
    axes = set()
    for leaf in leaves:
        axes |= _vma_of(leaf)
    if not axes:
        return init

    def _pv(x):
        need = axes - _vma_of(x)
        if not need:
            return x
        try:
            return lax.pcast(x, tuple(need), to="varying")
        except (AttributeError, TypeError):
            return lax.pvary(x, tuple(need))

    return jax.tree_util.tree_map(_pv, init)


def while_loop(cond, body, init):
    """``lax.while_loop`` that self-heals carry vma mismatches under
    shard_map (fresh-constant carries promoted to the varying union)."""
    try:
        return lax.while_loop(cond, body, init)
    except TypeError:
        return lax.while_loop(cond, body, promote_carry(init))


def scan(body, init, xs=None, **kw):
    """``lax.scan`` with the same carry-vma self-healing."""
    try:
        return lax.scan(body, init, xs, **kw)
    except TypeError:
        return lax.scan(body, promote_carry(init), xs, **kw)
