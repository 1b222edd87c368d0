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

import jax.numpy as jnp

from ..ops import curve, msm

# jitted shard_map programs, keyed by (mesh, axis, ndev, c, kind) — a fresh
# jax.jit wrapper per call would re-trace; shapes key the inner jit cache
_FN_CACHE: dict = {}


def _cached_fn(key, make):
    if key not in _FN_CACHE:
        _FN_CACHE[key] = make()
    return _FN_CACHE[key]


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
        # pairwise-halving fold: log2(D) EC-add instantiations in the
        # graph instead of D-1 (the unrolled chain measurably slowed the
        # 1-core XLA:CPU compile of the whole shard_map program)
        while parts.shape[0] > 1:
            m = parts.shape[0]
            if m % 2:
                parts = jnp.concatenate(
                    [parts, curve.identity((1,))], axis=0)
                m += 1
            parts = curve.add(parts[0::2], parts[1::2])
        return parts[0]

    # check_vma off: the post-all_gather tree sum is replicated by
    # construction, but the static checker can't see through the EC adds.
    # jit-wrapped so the program lands in the persistent compile cache
    # (bare shard_map executions bypass it — each process re-compiled).
    fn = _cached_fn(
        (mesh, axis, ndev, c, "single"),
        lambda: jax.jit(shard_map(local, mesh=mesh,
                                  in_specs=(P(axis), P(axis)),
                                  out_specs=P(), check_vma=False)))
    return fn(points, scalar_limbs)


def msm_many_sharded(points, scalars_batch, mesh: Mesh, axis="dp",
                     c: int = 8, small: bool = False):
    """B MSMs over the SAME sharded point set: the multi-chip commit phase.

    points: (N, 3, 16); scalars_batch: (B, N, 16) normal-form limbs, both
    sharded on the point axis. Each device runs the batched Pippenger
    (ops/msm.py) on its shard; the B partial points are all_gather-ed and
    tree-added (D·B tiny points over ICI). Returns (B, 3, 16) replicated.

    small=True swaps the per-shard Pippenger for msm.msm_small (batched
    double-and-add): identical group results, a ~100× smaller SPMD graph —
    the small-domain dry-run/test regime where XLA:CPU compile time of
    the sharded Pippenger (~535 s/process) was the stage-2 killer."""
    from .bootstrap import axis_size

    ndev = axis_size(mesh, axis)
    assert points.shape[0] % ndev == 0

    def local(pts, scs):
        if small:
            part = msm.msm_small_many(pts, scs)              # (B, 3, 16)
        else:
            part = jax.vmap(lambda s: msm.msm(pts, s, c))(scs)
        parts = jax.lax.all_gather(part, axis)               # (D, B, 3, 16)
        while parts.shape[0] > 1:
            m = parts.shape[0]
            if m % 2:
                parts = jnp.concatenate(
                    [parts, jnp.broadcast_to(curve.identity(),
                                             (1,) + parts.shape[1:])],
                    axis=0)
                m += 1
            parts = curve.add(parts[0::2], parts[1::2])
        return parts[0]

    fn = _cached_fn(
        (mesh, axis, ndev, c, small, "many"),
        lambda: jax.jit(shard_map(local, mesh=mesh,
                                  in_specs=(P(axis), P(None, axis)),
                                  out_specs=P(), check_vma=False)))
    return fn(points, scalars_batch)


def msm_many_sharded_mont(points, mont_batch, mesh: Mesh, axis="dp",
                          c: int = 8, small: bool = False):
    from ..ops.field import FR
    import jax.numpy as jnp

    one_raw = jnp.zeros_like(mont_batch).at[..., 0].set(1)
    return msm_many_sharded(points, FR.mul(mont_batch, one_raw), mesh, axis,
                            c, small=small)
