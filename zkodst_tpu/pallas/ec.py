"""Pallas TPU kernel: fused complete G1 addition (RCB16 Alg. 7, a=0).

The MSM/commitment hot loop (SURVEY.md §7 step 6). The jnp path
(ops/curve.py `add`) costs ~55 ms per 2^16-lane call on v5e: every one of
its ~15 Kogge–Stone field adds and stack/select ops round-trips HBM at the
TPU-hostile (…,16) minor-dim layout. This kernel runs the whole complete
addition — 12 Montgomery muls + 18 add/subs — on one VMEM lane-tile:
traffic is exactly the 3×2 point tensors in + 1 out.

Layout: points cross the boundary as (48, N) uint32 — the (N, 3, 16)
projective tensor transposed/reshaped so lanes are the batch axis. The
`ec_add()` wrapper handles packing; `ops.curve.add` routes here on TPU.

Also provides the fused segmented-scan step used by the MSM bucket
accumulation: out = f ? v : (v_prev + v), f_out = f | f_prev — folding the
selects into the kernel removes two more full-tensor HBM round trips per
scan level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import FQ
from .mulmod import L, _vec_add, _vec_mul, _vec_sub

PV = tuple(int(x) for x in FQ.P)
PINV = np.uint32(FQ.pinv16)


def _load_pt(ref):
    return ([ref[i, :] for i in range(L)],
            [ref[L + i, :] for i in range(L)],
            [ref[2 * L + i, :] for i in range(L)])


def _store_pt(ref, xyz):
    x, y, z = xyz
    for i in range(L):
        ref[i, :] = x[i]
        ref[L + i, :] = y[i]
        ref[2 * L + i, :] = z[i]


def _ec_add_vecs(p, q, zero):
    """Complete projective addition on register values (mirrors
    ops/curve.py add(), same RCB16 sequence and b3 = 9)."""
    pv = [np.uint32(v) for v in PV]

    def mul(a, b):
        return _vec_mul(a, b, pv, PINV, zero)

    def add(a, b):
        return _vec_add(a, b, pv, zero)

    def sub(a, b):
        return _vec_sub(a, b, pv, zero)

    def mul9(a):
        a2 = add(a, a)
        a4 = add(a2, a2)
        a8 = add(a4, a4)
        return add(a8, a)

    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    u1 = mul(add(x1, y1), add(x2, y2))
    u2 = mul(add(y1, z1), add(y2, z2))
    u3 = mul(add(x1, z1), add(x2, z2))
    t3 = sub(u1, add(t0, t1))
    t4 = sub(u2, add(t1, t2))
    w3 = sub(u3, add(t0, t2))
    t0_3 = add(add(t0, t0), t0)
    t2_9 = mul9(t2)
    z3p = add(t1, t2_9)
    t1m = sub(t1, t2_9)
    y3p = mul9(w3)
    a = mul(t3, t1m)
    b = mul(t4, y3p)
    c = mul(y3p, t0_3)
    d = mul(t1m, z3p)
    e = mul(z3p, t4)
    f = mul(t0_3, t3)
    return (sub(a, b), add(c, d), add(e, f))


def _ec_add_kernel(p_ref, q_ref, o_ref):
    zero = jnp.zeros_like(p_ref[0, :])
    out = _ec_add_vecs(_load_pt(p_ref), _load_pt(q_ref), zero)
    _store_pt(o_ref, out)


def _seg_step_kernel(p_ref, q_ref, f_ref, fp_ref, o_ref, fo_ref):
    """Segmented-scan step: o = f ? p : p + q ; fo = f | fp.

    p = current values, q = rolled-in previous values (already masked to
    identity where out-of-range by the caller), f/fp = segment-start flags
    as uint32 {0,1} rows of shape (1, T)."""
    zero = jnp.zeros_like(p_ref[0, :])
    p = _load_pt(p_ref)
    q = _load_pt(q_ref)
    s = _ec_add_vecs(p, q, zero)
    f = f_ref[0, :] != 0
    for i in range(L):
        o_ref[i, :] = jnp.where(f, p[0][i], s[0][i])
        o_ref[L + i, :] = jnp.where(f, p[1][i], s[1][i])
        o_ref[2 * L + i, :] = jnp.where(f, p[2][i], s[2][i])
    fo_ref[0, :] = (f_ref[0, :] | fp_ref[0, :]) & np.uint32(1)


def _interpret() -> bool:
    """Interpret-mode toggle: lets the packed kernels run (slowly) on the
    CPU backend so the chain-scan MSM path is unit-testable without a TPU."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover — no backend at all
        return True


_TILE = 2048   # measured best on v5e (2.78 ms/seg-step at 2^17 vs 3.59 at 512)

# phase-1 scan tile: log2(tile) fused levels run per tile. Smaller tiles
# mean fewer EC adds but more grid programs; measured on v5e the program
# overhead wins — 512 (9 levels) LOSES to 2048 (11 levels) by ~25%.
import os as _os

_SCAN_TILE = int(_os.environ.get("ZKODST_SCAN_TILE", "2048"))


def _seg_scan_tile_kernel(p_ref, f_ref, o_ref, fo_ref):
    """Tile-local segmented inclusive scan, ALL log2(T) levels in VMEM.

    The two-level MSM scan's phase 1: within one lane tile, run the
    Hillis–Steele segmented scan to completion (fori_loop body = one
    complete EC add + selects; shift amount is the loop carry, so the add
    graph is instantiated once). Tile aggregates are the last lane of each
    tile — the caller slices them out (a (48,1) output block would violate
    the mosaic lane-divisibility rule)."""
    from jax.experimental.pallas import tpu as pltpu

    T = p_ref.shape[1]
    zero = jnp.zeros_like(p_ref[0:1, :])                 # (1, T)
    idy = [np.uint32(x) for x in np.asarray(FQ.ONE)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    # statically unrolled levels; all values kept 2D (1, T) — mosaic can't
    # lower 1D rolls/concats — and flags stay uint32 VALUES (i1-valued
    # vectors don't lower; booleans appear only as select predicates)
    vs = [p_ref[i:i + 1, :] for i in range(3 * L)]
    fl = f_ref[0:1, :] & np.uint32(1)
    steps = max(1, (T - 1).bit_length())
    for it in range(steps):
        s = 1 << it
        oob = lane < s
        rows = []
        for r in range(3 * L):
            rolled = pltpu.roll(vs[r], shift=s, axis=1)
            fill = idy[r - L] if L <= r < 2 * L else np.uint32(0)
            rows.append(jnp.where(oob, fill, rolled))
        fp = jnp.where(oob, np.uint32(1), pltpu.roll(fl, shift=s, axis=1))
        p = (vs[:L], vs[L:2 * L], vs[2 * L:])
        q = (rows[:L], rows[L:2 * L], rows[2 * L:])
        sadd = _ec_add_vecs(p, q, zero)
        keep = fl != 0
        vs = [jnp.where(keep, vs[c * L + i], sadd[c][i])
              for c in range(3) for i in range(L)]
        fl = fl | fp
    for r in range(3 * L):
        o_ref[r:r + 1, :] = vs[r]
    fo_ref[0:1, :] = fl


def _chain_scan_kernel(p_ref, f_ref, o_ref, acc_ref):
    """Sequential chained segmented-scan step (grid axis = chain position).

    Lane l of every (48, W) grid block belongs to chain l; grid step s
    presents chain l's s-th element. The VMEM accumulator carries the
    running segment sum across grid steps:

        out = f ? p : acc + p ;  acc := out

    (acc starts as the identity point, so step 0 needs no special case —
    identity + p = p under complete addition.) This does ONE complete EC
    add per element — the Hillis–Steele tile scan it replaces does
    log2(tile) = 11, which measured as the whole-MSM floor (~13 ms per
    2^17 window; SURVEY.md §7 "speed-of-light kernels")."""
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    zero = jnp.zeros_like(p_ref[0, :])
    idy = [np.uint32(x) for x in np.asarray(FQ.ONE)]

    @pl.when(s == 0)
    def _init():                                 # acc := (0 : 1 : 0)
        for i in range(L):
            acc_ref[i, :] = zero
            acc_ref[L + i, :] = zero + idy[i]
            acc_ref[2 * L + i, :] = zero

    p = _load_pt(p_ref)
    acc = _load_pt(acc_ref)
    ssum = _ec_add_vecs(acc, p, zero)
    f = f_ref[0, :] != 0
    for ci in range(3):
        for i in range(L):
            v = jnp.where(f, p[ci][i], ssum[ci][i])
            o_ref[ci * L + i, :] = v
            acc_ref[ci * L + i, :] = v


@partial(jax.jit, static_argnums=(2,))
def chain_scan_local(pt, f, W: int):
    """Per-chain segmented inclusive scan of chain-major packed points.

    pt (48, N) with chain l at lanes l, W+l, 2W+l, …; f (1, N) uint32
    segment-start flags in the same layout. Chain heads are treated as
    segment starts (cross-chain carries are the caller's phase 2/3).
    Returns the (48, N) local scan; chain aggregates are the last block's
    lanes, out[:, N-W:]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pt.shape[1]
    assert n % W == 0 and n // W >= 1
    S = n // W
    return pl.pallas_call(
        _chain_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
        grid=(S,),
        in_specs=[pl.BlockSpec((3 * L, W), lambda i: (0, i)),
                  pl.BlockSpec((1, W), lambda i: (0, i))],
        out_specs=pl.BlockSpec((3 * L, W), lambda i: (0, i)),
        scratch_shapes=[pltpu.VMEM((3 * L, W), jnp.uint32)],
        interpret=_interpret(),
    )(pt, f)


@jax.jit
def seg_scan_tiles(pt, f):
    """Phase 1 of the two-level segmented scan.

    pt (48, N) packed points, f (1, N) uint32 flags ->
    (local_scan (48, N), scanned_flags (1, N)); aggregates live at lanes
    tile-1, 2·tile-1, … of the outputs."""
    from jax.experimental import pallas as pl

    n = pt.shape[1]
    tile = min(_SCAN_TILE, n)
    assert n % tile == 0
    ntiles = n // tile
    return pl.pallas_call(
        _seg_scan_tile_kernel,
        out_shape=(jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
                   jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        grid=(ntiles,),
        in_specs=[pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
                   pl.BlockSpec((1, tile), lambda i: (0, i))),
        interpret=_interpret(),
    )(pt, f)


def _scale_reduce_kernel(c: int, nlive: int, p_ref, o_ref):
    """Σ_w 2^{c·w} · P_w over the 128 lanes of one (48, 128) block.

    Replaces the prover MSM's Horner window combine — measured 58.8 ms of
    a 157.6 ms 2^17 MSM (scripts/profile_components.py): 266 sequential
    single-point EC ops in the jnp graph cost ~0.22 ms each in dispatch/
    fusion overhead. Here the same math runs as one VMEM-resident kernel:

      phase 1 — progressive masked doubling: after step j, lane w holds
        2^{min(j, c·w)} · P_w  (a lane doubles while j < c·w), so
        c·(nlive−1) fori_loop steps scale every window at once;
      phase 2 — pairwise lane-halving tree fold (roll + masked add),
        7 levels, leaving the total in lane 0 (other lanes: identity).

    Lanes ≥ the live window count must hold the identity point on entry
    (identity scales and folds to identity under complete addition)."""
    from jax.experimental.pallas import tpu as pltpu

    W = p_ref.shape[1]
    zero = jnp.zeros((W,), jnp.uint32)
    pv = [np.uint32(v) for v in PV]
    idy = [np.uint32(x) for x in np.asarray(FQ.ONE)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).reshape(-1)

    def rows(v2d):
        r = [v2d[i, :] for i in range(3 * L)]
        return (r[:L], r[L:2 * L], r[2 * L:])

    def assemble(xyz):
        return jnp.concatenate(
            [v.reshape(1, -1) for coord in xyz for v in coord], axis=0)

    acc = p_ref[:, :]                                  # (48, W)
    nsteps = c * (nlive - 1)

    def body(j, acc):
        p = rows(acc)
        dbl = _ec_add_vecs(p, p, zero)
        live = j < c * lane
        out = tuple(
            [jnp.where(live, dbl[ci][i], p[ci][i]) for i in range(L)]
            for ci in range(3))
        return assemble(out)

    acc = jax.lax.fori_loop(0, nsteps, body, acc)

    s = W // 2
    while s >= 1:
        p = rows(acc)
        rolled = pltpu.roll(acc, (-s) % W, axis=1)
        q = rows(rolled)
        ssum = _ec_add_vecs(p, q, zero)
        keep = lane < s
        out = tuple(
            [jnp.where(keep, ssum[ci][i],
                       idy[i] if ci == 1 else np.uint32(0))
             for i in range(L)]
            for ci in range(3))
        acc = assemble(out)
        s //= 2
    o_ref[:, :] = acc


@partial(jax.jit, static_argnums=(1, 2))
def scale_reduce(ws, c: int, nlive: int):
    """ws (48, 128) packed window sums (lane w = window w, identity
    beyond lane nlive−1) -> (48, 128) with Σ_w 2^{c·w}·ws_w in lane 0."""
    from jax.experimental import pallas as pl

    assert ws.shape == (3 * L, 128), ws.shape
    assert 1 <= nlive <= 128
    return pl.pallas_call(
        partial(_scale_reduce_kernel, c, nlive),
        out_shape=jax.ShapeDtypeStruct((3 * L, 128), jnp.uint32),
        in_specs=[pl.BlockSpec((3 * L, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((3 * L, 128), lambda: (0, 0)),
        interpret=_interpret(),
    )(ws)


def _grid_specs(n, rows, tile):
    from jax.experimental import pallas as pl

    return dict(grid=(n // tile,),
                in_specs=[pl.BlockSpec((rows, tile), lambda i: (0, i))],
                out_specs=pl.BlockSpec((rows, tile), lambda i: (0, i)))


@jax.jit
def ec_add_t(pt, qt):
    """Fused complete add on (48, N) packed points."""
    from jax.experimental import pallas as pl

    n = pt.shape[1]
    tile = min(_TILE, n)
    assert n % tile == 0
    return pl.pallas_call(
        _ec_add_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((3 * L, tile), lambda i: (0, i))] * 2,
        out_specs=pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
        interpret=_interpret(),
    )(pt, qt)


@jax.jit
def seg_step_t(pt, qt, f, fp):
    """Fused segmented-scan step on packed points + (1, N) uint32 flags."""
    from jax.experimental import pallas as pl

    n = pt.shape[1]
    tile = min(_TILE, n)
    assert n % tile == 0
    return pl.pallas_call(
        _seg_step_kernel,
        out_shape=(jax.ShapeDtypeStruct((3 * L, n), jnp.uint32),
                   jax.ShapeDtypeStruct((1, n), jnp.uint32)),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
                  pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
                  pl.BlockSpec((1, tile), lambda i: (0, i)),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((3 * L, tile), lambda i: (0, i)),
                   pl.BlockSpec((1, tile), lambda i: (0, i))),
        interpret=_interpret(),
    )(pt, qt, f, fp)


def pack(points):
    """(N, 3, 16) -> (48, N) with lane padding to the tile multiple."""
    n = points.shape[0]
    pad = (-n) % min(_TILE, max(128, 1 << (n - 1).bit_length() if n > 1
                                else 128))
    if pad:
        from ..ops import curve

        idp = jnp.broadcast_to(curve.identity(), (pad, 3, 16))
        points = jnp.concatenate([points, idp], axis=0)
    return points.reshape(points.shape[0], 3 * L).T, n


def unpack(pt, n):
    return pt.T.reshape(-1, 3, L)[:n]


def ec_add(p, q):
    """Drop-in for ops.curve.add on (..., 3, 16) tensors."""
    shape = p.shape
    p2 = p.reshape(-1, 3, L)
    q2 = jnp.broadcast_to(q, shape).reshape(-1, 3, L)
    pt, n = pack(p2)
    qt, _ = pack(q2)
    return unpack(ec_add_t(pt, qt), n).reshape(shape)
