"""Sharded grand-product scans: cumulative field products with cross-shard
carries (SURVEY.md §5.7 — "grand-product scans become associative scans +
cross-chip carries").

Replaces the rayon-parallel product trees inside halo2's permutation/lookup
provers (SURVEY.md §2.3 N9/N10, N13) for the mesh path of create_proof:
each device scans its row shard locally (the same traced-stride
Hillis–Steele as the single-chip prover), shard totals are all_gather-ed
(D tiny values) and each device folds in the exclusive product of the
shards before it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.field import Field


def cumprod_incl_sharded(F: Field, x, mesh: Mesh, axis):
    """Inclusive cumulative field product along axis 0 of (n, 16),
    sharded on the row axis. Returns (incl (n,16) sharded, total (16,)
    replicated)."""
    from ..proof.prover import _cumprod_incl

    from .bootstrap import axis_size

    ndev = axis_size(mesh, axis)

    def local(xb):
        incl = _cumprod_incl(xb)                       # local shard scan
        tots = jax.lax.all_gather(incl[-1], axis)      # (D, 16)
        idx = jax.lax.axis_index(axis)
        carry = jnp.asarray(F.ONE)
        total = jnp.asarray(F.ONE)
        one = jnp.asarray(F.ONE)
        for d in range(ndev):
            carry = F.mul(carry, jnp.where(d < idx, tots[d], one))
            total = F.mul(total, tots[d])
        out = F.mul(jnp.broadcast_to(carry, incl.shape), incl)
        return out, total

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis),),
                   out_specs=(P(axis), P()), check_vma=False)
    return fn(x)
