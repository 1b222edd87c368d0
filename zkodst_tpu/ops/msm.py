"""Multi-scalar multiplication (Pippenger) on TPU.

Replaces halo2's `best_multiexp` (SURVEY.md §2.3 N8) — the commitment-side
hot loop of the prover. The classic bucket method is irregular
(scatter/accumulate); the TPU-native reformulation used here is fully
vectorized and branchless:

  per window:  sort (digit, index)  ->  gather points into digit order
               -> segmented inclusive scan (complete EC adds, log2 N depth)
               -> bucket sums at segment boundaries (unique-index scatter)
               -> Σ d·B_d via suffix-sum scans (log2 2^c depth)
  combine:     Horner over windows (c doublings + 1 add each)

Windows are processed under `lax.scan` so peak memory is one gathered copy
of the points (N×192 B), and the whole MSM is one compiled program. The
segmented scan uses `jax.lax.associative_scan` with the complete-addition
operator from ops/curve.py, so identity/doubling edge cases need no code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import curve
from .field import FR

SCALAR_BITS = 254


def _digits(scalar_limbs, c: int, nwin: int):
    """(N, 16) uint32 16-bit limbs -> (nwin, N) uint32 c-bit digits."""
    N = scalar_limbs.shape[0]
    outs = []
    for w in range(nwin):
        bit = w * c
        limb, off = bit // 16, bit % 16
        lo = scalar_limbs[:, limb] >> off
        if off + c > 16 and limb + 1 < 16:
            lo = lo | (scalar_limbs[:, limb + 1] << (16 - off))
        outs.append(lo & np.uint32((1 << c) - 1))
    return jnp.stack(outs)


def _seg_scan_points(pts, starts):
    """Segmented inclusive prefix "sum" (EC add) along axis 0.

    Hillis–Steele with the stride as a *traced* scan element, so the
    complete-addition graph is instantiated exactly once (jax.lax.
    associative_scan would clone it log2(N)·2 times and XLA compile time
    explodes — measured minutes at N=2^17).

    pts: (N, 3, 16); starts: (N,) bool segment-start flags."""
    N = pts.shape[0]
    steps = max(1, (N - 1).bit_length())
    strides = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    ids = jnp.arange(N, dtype=jnp.int32)
    ident = jnp.broadcast_to(curve.identity(), pts.shape)

    def body(carry, stride):
        v, f = carry
        v_prev = jnp.roll(v, stride, axis=0)
        f_prev = jnp.roll(f, stride, axis=0)
        oob = ids < stride                      # rolled-in garbage
        v_prev = jnp.where(oob[..., None, None], ident, v_prev)
        f_prev = jnp.logical_or(f_prev, oob)
        v_new = jnp.where(f[..., None, None], v, curve.add(v_prev, v))
        f_new = jnp.logical_or(f, f_prev)
        return (v_new, f_new), None

    (v, _), _ = jax.lax.scan(body, (pts, starts), strides)
    return v


def _bucket_tails(keys, scanned, c: int):
    """Scatter per-segment totals (the scan value at each segment's last
    row) to their digit's bucket slot.

    keys: (N,) sorted digits; scanned: (N, 3, 16) segmented inclusive scan.
    Returns (2^c, 3, 16) bucket sums (identity where empty); digit 0 gets a
    slot but weight 0 downstream."""
    ends = jnp.concatenate([keys[1:] != keys[:-1], jnp.ones((1,), bool)])
    nb = 1 << c
    idx = jnp.where(ends, keys, nb)         # out-of-range dump for non-ends
    buckets = jnp.broadcast_to(curve.identity(), (nb + 1, 3, 16))
    buckets = buckets.at[idx].set(scanned, mode="drop")
    return buckets[:nb]


def _weighted_bucket_total(buckets, packed: bool = False):
    """Σ_{d>=1} d * B_d via suffix sums: S_j = Σ_{d>=j} B_d; total = Σ_{j>=1} S_j."""
    nb = buckets.shape[0]
    first = jnp.zeros((nb,), bool).at[0].set(True)
    if packed and nb >= 1024:
        # large windows (c ≥ 10): run both scans through the fused packed
        # kernels — the jnp path costs a full complete-add graph per level
        from ..pallas import ec

        pb = ec.pack(buckets[::-1])[0]
        suffix = ec.unpack(_seg_scan_packed(pb, first), nb)[::-1]
        tail = jnp.concatenate(
            [suffix[1:], jnp.broadcast_to(curve.identity(), (1, 3, 16))])
        pt = ec.pack(tail)[0]
        return ec.unpack(_seg_scan_packed(pt, first), nb)[-1]
    suffix = _seg_scan_points(buckets[::-1], first)[::-1]  # S_j at j
    # drop j=0 (weight 0) and sum the rest: last of an unsegmented scan
    total = _seg_scan_points(suffix[1:], first[: nb - 1])[-1]
    return total


def _seg_scan_packed_flat(pt, starts):
    """Single-level packed segmented scan (used for cross-tile aggregates
    and as the small-N path): one fused Pallas step per level."""
    from ..pallas import ec

    n = pt.shape[1]
    steps = max(1, (n - 1).bit_length())
    strides = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    from .field import FQ as _FQ

    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = _FQ.ONE                 # identity point: (0 : 1 : 0)
    idp = jnp.asarray(idp)
    f0 = starts.astype(jnp.uint32)[None, :]

    def body(carry, stride):
        v, f = carry
        v_prev = jnp.roll(v, stride, axis=1)
        f_prev = jnp.roll(f, stride, axis=1)
        oob = (ids < stride)
        v_prev = jnp.where(oob[None, :], idp, v_prev)
        f_prev = f_prev | oob[None, :].astype(jnp.uint32)
        v_new, f_new = ec.seg_step_t(v, v_prev, f, f_prev)
        return (v_new, f_new), None

    (v, _), _ = jax.lax.scan(body, (pt, f0), strides)
    return v


def _seg_scan_packed(pt, starts):
    """Two-level packed segmented scan: pt (48, N), starts (N,) bool.

    Phase 1 runs the whole intra-tile scan in ONE Pallas kernel pass
    (VMEM-resident, log2(T) fused levels); phase 2 scans the n/T tile
    aggregates with the flat path; phase 3 is one seg-step applying the
    exclusive tile carries. ~2 full-array passes instead of log2(N)."""
    from ..pallas import ec
    from .field import FQ as _FQ

    n = pt.shape[1]
    tile = ec._SCAN_TILE
    if n < 2 * tile or n % tile != 0:
        return _seg_scan_packed_flat(pt, starts)

    f0 = starts.astype(jnp.uint32)[None, :]
    v_loc, _ = ec.seg_scan_tiles(pt, f0)
    agg = v_loc[:, tile - 1::tile]              # tile aggregates (last lanes)
    ntiles = agg.shape[1]
    # "segment start at-or-before i within the tile" — NOT the kernel's
    # internal boundary flag (which saturates to 1): within-tile prefix-OR
    within = jnp.cumsum(
        starts.reshape(ntiles, tile).astype(jnp.uint32), axis=1) > 0
    f_loc_true = within.reshape(1, -1).astype(jnp.uint32)
    aggf = within[:, -1]                        # tile contains a start

    incl = _seg_scan_packed_flat(agg, aggf)             # (48, ntiles)
    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = _FQ.ONE
    carry = jnp.concatenate([jnp.asarray(idp), incl[:, :-1]], axis=1)
    fc = jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32),
         jnp.cumsum(aggf[:-1].astype(jnp.uint32))])[None, :]
    fc = (fc > 0).astype(jnp.uint32)

    carry_full = jnp.repeat(carry, tile, axis=1)        # (48, N)
    fc_full = jnp.repeat(fc, tile, axis=1)
    out, _ = ec.seg_step_t(v_loc, carry_full, f_loc_true, fc_full)
    return out


@partial(jax.jit, static_argnums=(2, 3))
def msm(points, scalar_limbs, c: int = 8, scalar_bits: int = SCALAR_BITS):
    """Σ_i scalar_i · P_i.

    Args:
      points: (N, 3, 16) uint32 projective G1 points (Fq Montgomery limbs).
      scalar_limbs: (N, 16) uint32 — scalars as 16-bit limbs in NORMAL
        (non-Montgomery) form.
      c: window bits (must divide into the 16-bit limb grid: 4, 8 or 16).
      scalar_bits: bound on the scalars — windows above it hold only zero
        digits and are skipped entirely. Witness columns are u64 values,
        so their commits run 5 windows instead of 20 (prover advice path).

    Returns (3, 16) projective sum."""
    from ..ops.field import _pallas_wanted
    from ..pallas import ec

    assert 1 <= c <= 16
    # wide windows only pay off when the 2^c bucket arrays are small next
    # to n (the per-window scan is c-independent; bucket suffix scans are
    # not) — clamp toward the classic c ≈ log2(n) for small inputs (floor
    # 8 so tiny test/dryrun MSMs share one compiled window program)
    c = min(c, max(8, points.shape[0].bit_length() - 1))
    nwin = (scalar_bits + c - 1) // c
    N = points.shape[0]
    digs = _digits(scalar_limbs, c, nwin)               # (nwin, N)
    packed = _pallas_wanted(points[..., 0, :], points[..., 0, :]) \
        and N % 512 == 0
    pts_packed = ec.pack(points)[0] if packed else None

    logn = max(1, (N - 1).bit_length())

    def window_body(_, keys):
        if c + logn <= 32:
            # single-operand sort: digit in the high bits, index in the
            # low — cheaper than the 2-operand variant and stable for free
            packed_k = (keys << np.uint32(logn)) | jnp.arange(
                N, dtype=jnp.uint32)
            skp = jax.lax.sort(packed_k)
            skeys = skp >> np.uint32(logn)
            sidx = skp & np.uint32((1 << logn) - 1)
        else:
            skeys, sidx = jax.lax.sort(
                (keys, jnp.arange(keys.shape[0], dtype=jnp.uint32)),
                num_keys=1)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
        if packed:
            g = jnp.take(pts_packed, sidx, axis=1)
            scanned = ec.unpack(_seg_scan_packed(g, starts), N)
        else:
            g = jnp.take(points, sidx, axis=0)
            scanned = _seg_scan_points(g, starts)
        buckets = _bucket_tails(skeys, scanned, c)
        return None, _weighted_bucket_total(buckets, packed)

    _, win_sums = jax.lax.scan(window_body, None, digs)   # (nwin, 3, 16)

    # Horner over windows, MSB first: acc = 2^c * acc + S_w
    def combine(acc, s):
        for _ in range(c):
            acc = curve.double(acc)
        return curve.add(acc, s), None

    acc0 = win_sums[-1]
    acc, _ = jax.lax.scan(combine, acc0, win_sums[:-1][::-1])
    return acc


def msm_mont(points, fr_mont_scalars, c: int = 8,
             scalar_bits: int = SCALAR_BITS):
    """MSM with scalars given as Fr Montgomery limb arrays (converts first)."""
    one_raw = jnp.zeros_like(fr_mont_scalars).at[..., 0].set(1)
    normal = FR.mul(fr_mont_scalars, one_raw)   # Montgomery mul by raw 1
    return msm(points, normal, c, scalar_bits)


@partial(jax.jit, static_argnums=(2, 3))
def msm_many(points, scalars_batch, c: int = 8,
             scalar_bits: int = SCALAR_BITS):
    """B MSMs over the SAME point set in one dispatch (vmapped Pippenger).

    points: (N, 3, 16); scalars_batch: (B, N, 16) normal-form limbs.
    Returns (B, 3, 16). One compile + one dispatch for a whole commit
    phase (the prover/keygen commit 8-38 columns at a time)."""
    return jax.vmap(lambda s: msm(points, s, c, scalar_bits))(scalars_batch)


def msm_many_mont(points, mont_batch, c: int = 8,
                  scalar_bits: int = SCALAR_BITS):
    one_raw = jnp.zeros_like(mont_batch).at[..., 0].set(1)
    return msm_many(points, FR.mul(mont_batch, one_raw), c, scalar_bits)
