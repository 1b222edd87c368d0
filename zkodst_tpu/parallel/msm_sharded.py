"""Multi-chip MSM: points sharded over the mesh, one Pippenger per chip.

The TPU-native replacement for rayon splitting MSM buckets across cores
(SURVEY.md §2.3 N13, §2.4 TP row): `shard_map` over a 1-D mesh axis, each
device runs the full windowed-bucket MSM (ops/msm.py) on its point/scalar
shard, partial sums are `all_gather`-ed (D tiny points) and tree-added —
point addition is not a `psum`-able reduction, but D is small so the
gather+tree costs one latency hop.

Scalars/points layout: leading axis sharded (P("dp")); result replicated.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import curve, msm


def msm_sharded(points, scalar_limbs, mesh: Mesh, axis: str = "dp",
                c: int = 8):
    """Σ_i scalar_i · P_i with the i axis sharded over `axis`.

    points: (N, 3, 16); scalar_limbs: (N, 16) normal-form 16-bit limbs.
    N must divide evenly by the mesh axis size. Returns (3, 16) replicated.
    """
    ndev = mesh.shape[axis]
    assert points.shape[0] % ndev == 0

    def local(pts, scs):
        part = msm.msm(pts, scs, c)                    # (3, 16)
        parts = jax.lax.all_gather(part, axis)         # (D, 3, 16)
        acc = parts[0]
        for d in range(1, ndev):                       # static tree is tiny
            acc = curve.add(acc, parts[d])
        return acc

    # check_vma off: the post-all_gather tree sum is replicated by
    # construction, but the static checker can't see through the EC adds
    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                   out_specs=P(), check_vma=False)
    return fn(points, scalar_limbs)


def msm_many_sharded(points, scalars_batch, mesh: Mesh, axis="dp",
                     c: int = 8):
    """B MSMs over the SAME sharded point set: the multi-chip commit phase.

    points: (N, 3, 16); scalars_batch: (B, N, 16) normal-form limbs, both
    sharded on the point axis. Each device runs the batched Pippenger
    (ops/msm.py) on its shard; the B partial points are all_gather-ed and
    tree-added (D·B tiny points over ICI). Returns (B, 3, 16) replicated."""
    from .bootstrap import axis_size

    ndev = axis_size(mesh, axis)
    assert points.shape[0] % ndev == 0

    def local(pts, scs):
        part = jax.vmap(lambda s: msm.msm(pts, s, c))(scs)   # (B, 3, 16)
        parts = jax.lax.all_gather(part, axis)               # (D, B, 3, 16)
        acc = parts[0]
        for d in range(1, ndev):
            acc = curve.add(acc, parts[d])
        return acc

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P(None, axis)),
                   out_specs=P(), check_vma=False)
    return fn(points, scalars_batch)


def msm_many_sharded_mont(points, mont_batch, mesh: Mesh, axis="dp",
                          c: int = 8):
    from ..ops.field import FR
    import jax.numpy as jnp

    one_raw = jnp.zeros_like(mont_batch).at[..., 0].set(1)
    return msm_many_sharded(points, FR.mul(mont_batch, one_raw), mesh, axis,
                            c)
