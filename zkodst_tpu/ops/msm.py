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
    and as the small-N path): one fused Pallas step per level.

    When the whole array fits one scan tile on a kernel backend, the
    log2(n) separate seg-step launches collapse into ONE tile-kernel
    program (all levels in VMEM) — the per-window aggregate scans were
    ~10 sequential ~0.1 ms launches each (round-5 profiling)."""
    n = pt.shape[1]
    from ..pallas import ec

    if _use_kernels() and 128 <= n <= ec._SCAN_TILE and n % 128 == 0:
        v, _ = ec.seg_scan_tiles(pt, starts.astype(jnp.uint32)[None, :])
        return v
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
        v_new, f_new = _seg_step(v, v_prev, f, f_prev)
        return (v_new, f_new), None

    (v, _), _ = jax.lax.scan(body, (pt, f0), strides)
    return v


def _use_kernels() -> bool:
    """Pallas kernels on TPU; jnp emulation (same semantics, fast CPU
    compiles) elsewhere — interpret-mode compiles take minutes on the
    1-core host, so CPU tests run the packed path through these
    fallbacks and the kernels are validated on real TPU."""
    import os

    if os.environ.get("ZKODST_FORCE_KERNELS"):
        return True          # CPU interpret-mode kernel tests
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def _seg_step(pt, qt, f, fp):
    """One segmented-scan step on packed points: out = f ? p : p + q."""
    from ..pallas import ec

    if _use_kernels():
        return ec.seg_step_t(pt, qt, f, fp)
    n = pt.shape[1]
    p, q = ec.unpack(pt, n), ec.unpack(qt, n)
    keep = f[0] != 0
    v = jnp.where(keep[:, None, None], p, curve.add(p, q))
    return v.reshape(n, 48).T, f | fp


def _chain_scan_local(pt, starts, W: int):
    """Per-chain segmented inclusive scan (phase 1 of the chained scan);
    Pallas kernel on TPU, an equivalent lax.scan over the S chain
    positions elsewhere."""
    from ..pallas import ec

    if _use_kernels():
        return ec.chain_scan_local(pt, starts.astype(jnp.uint32)[None, :], W)
    n = pt.shape[1]
    S = n // W
    blocks = jnp.moveaxis(pt.reshape(48, S, W), 1, 0)     # (S, 48, W)
    fb = starts.reshape(S, W)

    def body(acc, xs):
        blk, fs = xs
        p = blk.T.reshape(W, 3, 16)
        v = jnp.where(fs[:, None, None], p, curve.add(acc, p))
        return v, v.reshape(W, 48).T

    acc0 = jnp.broadcast_to(curve.identity(), (W, 3, 16))
    _, outs = jax.lax.scan(body, acc0, (blocks, fb))      # (S, 48, W)
    return jnp.moveaxis(outs, 0, 1).reshape(48, n)


def _chain_w(n: int) -> int | None:
    """Lane width for the chained sequential scan (None = unsuitable).

    Wider W = fewer grid programs but a costlier phase-2 aggregate scan
    (log2 W levels x W lanes); 2048 balances both at n = 2^17."""
    import os

    want = int(os.environ.get("ZKODST_CHAIN_W", "2048"))
    if want == 0:                   # explicit opt-out (A/B benchmarking)
        return None
    for w in (want, 2048, 1024, 512, 256, 128):
        if w >= 128 and n % w == 0 and n // w >= 2:
            return w
    return None


def _seg_scan_chains(pt, starts, W: int):
    """Chained sequential segmented scan: ONE complete EC add per element.

    pt (48, N) packed points in CHAIN-MAJOR order: chain l owns lanes
    l, W+l, 2W+l, … (the caller folds this permutation into its gather
    indices for free). starts: (N,) bool segment-start flags, same layout.

    Returns (local, carry): `local` is the per-chain segmented inclusive
    scan (48, N); `carry[:, l]` (48, W) is the exclusive cross-chain
    segmented carry to add to chain l's leading run. Phase 1 is the
    sequential Pallas kernel (N adds total — the Hillis-Steele tile scan
    it replaces does 11N); phase 2 is a flat scan over the W aggregates."""
    from .field import FQ as _FQ

    n = pt.shape[1]
    S = n // W
    local = _chain_scan_local(pt, starts, W)
    agg = local[:, (S - 1) * W:]                        # (48, W)
    aggf = jnp.any(starts.reshape(S, W), axis=0)        # chain has a start
    incl = _seg_scan_packed_flat(agg, aggf)
    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = _FQ.ONE
    carry = jnp.concatenate([jnp.asarray(idp), incl[:, :-1]], axis=1)
    return local, carry


def _seg_scan_chained_full(pt, starts, W: int):
    """Full segmented inclusive scan in ORIGINAL order via the chained
    sequential kernel: one EC add per element (the two-level tile scan
    does log2(tile) = 11) plus a W-lane aggregate pass. Chain l covers
    the contiguous natural range [l·S, (l+1)·S)."""
    n = pt.shape[1]
    S = n // W

    def cm(a):
        return jnp.moveaxis(
            a.reshape(a.shape[0], W, S), 1, 2).reshape(a.shape[0], n)

    def nat(a):
        return jnp.moveaxis(
            a.reshape(a.shape[0], S, W), 1, 2).reshape(a.shape[0], n)

    sw = starts.reshape(W, S)
    local, carry = _seg_scan_chains(cm(pt), sw.T.reshape(-1), W)
    local_n = nat(local)
    # natural index i = l·S + s needs the cross-chain carry iff chain l
    # has no segment start at-or-before s
    fs = jnp.where(jnp.any(sw, axis=1), jnp.argmax(sw, axis=1), S)  # (W,)
    s_of = jnp.arange(n, dtype=jnp.int32) % S
    needs = s_of < jnp.repeat(fs, S)
    keep = jnp.logical_not(needs).astype(jnp.uint32)[None, :]
    carry_full = jnp.repeat(carry, S, axis=1)
    out, _ = _seg_step(local_n, carry_full, keep, jnp.zeros_like(keep))
    return out


def _weighted_total_packed(buckets):
    """Σ_{d>=1} d · B_d for packed (48, nb) buckets, via suffix sums
    (S_j = Σ_{d>=j} B_d; total = Σ_{j>=1} S_j) — all in packed layout, no
    (nb, 3, 16) transposes. Returns a packed (48, 1) point column."""
    from .field import FQ as _FQ

    nb = buckets.shape[1]
    first = jnp.zeros((nb,), bool).at[0].set(True)

    def seg_scan(pt, st):
        # chained path: 1 add/element vs 11 for the tiled Hillis–Steele
        # (the two scans here were ~1.1 ms/window of the 2^17 MSM's
        # ~4.9 ms/window — profile_components.py round 5)
        if _use_kernels() and nb >= 2048 and nb % 512 == 0:
            return _seg_scan_chained_full(pt, st, 512)
        return _seg_scan_packed(pt, st)

    suffix = seg_scan(buckets[:, ::-1], first)[:, ::-1]
    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = _FQ.ONE
    tmp = jnp.concatenate([jnp.asarray(idp), suffix[:, 1:]], axis=1)
    return seg_scan(tmp, first)[:, -1:]


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
    if n < 2 * tile or n % tile != 0 or not _use_kernels():
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
    out, _ = _seg_step(v_loc, carry_full, f_loc_true, fc_full)
    return out


def _chain_window(pts_packed, skeys, sidx, starts, c: int, W: int):
    """One Pippenger window on the chained-sequential-scan path.

    The sort's output is re-laid chain-major (permutation folded into the
    gather indices — free), scanned with one-EC-add-per-element, and the
    bucket sums are GATHERED at per-bucket tail positions located by a
    single `searchsorted` over the sorted digits — no (N, 3, 16) unpack,
    no N-row scatter, no full-array carry pass (carries are applied to
    the ≤2^c tails only). Returns the window's (3, 16) weighted total."""
    from ..pallas import ec
    from .field import FQ as _FQ

    N = skeys.shape[0]
    S = N // W
    sidx_p = sidx.reshape(W, S).T.reshape(-1)
    starts_p = starts.reshape(W, S).T.reshape(-1)
    g = jnp.take(pts_packed, sidx_p, axis=1)
    local, carry = _seg_scan_chains(g, starts_p, W)

    nb = 1 << c
    d = jnp.arange(nb, dtype=jnp.uint32)
    right = jnp.searchsorted(skeys, d, side="right")
    left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
    present = right > left
    tj = jnp.maximum(right - 1, 0)              # sorted tail index
    tl, ts = tj // S, tj % S                    # chain, position-in-chain
    vals = jnp.take(local, ts * W + tl, axis=1)             # (48, nb)

    # cross-chain carry applies iff the tail's segment began in an earlier
    # chain — i.e. no start at-or-before ts within chain tl
    sw = starts.reshape(W, S)
    fs = jnp.where(jnp.any(sw, axis=1), jnp.argmax(sw, axis=1), S)
    needs = ts < jnp.take(fs, tl)
    cvals = jnp.take(carry, tl, axis=1)
    keep = jnp.logical_not(needs).astype(jnp.uint32)[None, :]
    vals, _ = _seg_step(vals, cvals, keep, jnp.zeros_like(keep))

    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = _FQ.ONE
    vals = jnp.where(present[None, :], vals, jnp.asarray(idp))
    return ec.unpack(_weighted_total_packed(vals), 1)[0]


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
    import os

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
    packed = (_pallas_wanted(points[..., 0, :], points[..., 0, :])
              or bool(os.environ.get("ZKODST_FORCE_PACKED"))) \
        and N % 512 == 0
    pts_packed = ec.pack(points)[0] if packed else None

    logn = max(1, (N - 1).bit_length())
    W = _chain_w(N) if packed else None

    if c + logn <= 32:
        # single-operand sort: digit in the high bits, index in the low —
        # cheaper than the 2-operand variant and stable for free. ALL
        # windows sort in one batched dispatch (rows sort independently):
        # in-scan per-window sorts measured ~1.5 ms each × nwin at 2^17
        # (scripts/profile_components.py) vs one wide sort.
        packed_all = (digs << np.uint32(logn)) | jnp.arange(
            N, dtype=jnp.uint32)[None, :]
        skp_all = jax.lax.sort(packed_all, dimension=1)   # (nwin, N)

        def split(skp):
            return (skp >> np.uint32(logn),
                    skp & np.uint32((1 << logn) - 1))

        scan_xs = skp_all
    else:
        def split(both):
            return both

        def _sort_one(keys):
            return jax.lax.sort(
                (keys, jnp.arange(keys.shape[0], dtype=jnp.uint32)),
                num_keys=1)

        scan_xs = jax.vmap(_sort_one)(digs)

    def window_body(_, xs):
        skeys, sidx = split(xs)
        starts = jnp.concatenate(
            [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
        if W is not None:
            return None, _chain_window(
                pts_packed, skeys, sidx, starts, c, W)
        if packed:
            g = jnp.take(pts_packed, sidx, axis=1)
            scanned = ec.unpack(_seg_scan_packed(g, starts), N)
        else:
            g = jnp.take(points, sidx, axis=0)
            scanned = _seg_scan_points(g, starts)
        buckets = _bucket_tails(skeys, scanned, c)
        return None, _weighted_bucket_total(buckets, packed)

    _, win_sums = jax.lax.scan(window_body, None, scan_xs)  # (nwin, 3, 16)

    if packed and _use_kernels():
        # fused scale-and-reduce kernel: Σ_w 2^{c·w}·S_w in one VMEM pass
        # (the jnp Horner below costs ~0.22 ms per EC op in graph overhead
        # — 58.8 ms of a 157.6 ms 2^17 MSM; profile_components.py).
        # Real-kernel backends only: in pallas INTERPRET mode the
        # fori_loop body leaks memory without bound (observed 66 GB RSS
        # on the FORCE_PACKED CPU test) — the jnp Horner below is the
        # CPU path; kernel coverage is the slow-marked interpret test.
        idp = jnp.broadcast_to(curve.identity(), (128 - nwin, 3, 16))
        wsp = jnp.concatenate([win_sums, idp]).reshape(128, 48).T
        return ec.unpack(ec.scale_reduce(wsp, c, nwin)[:, :1], 1)[0]

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


@jax.jit
def msm_small(points, scalar_limbs):
    """Tiny-N MSM: batched 256-step double-and-add + pairwise tree fold.

    Same group element as the Pippenger path (identical complete-formula
    adds, different association order — EC addition is associative), but
    the XLA graph is ~100× smaller: one scan body of (double + add +
    select) instead of windows × (sort + gather + segmented scans +
    bucket suffix scans). Used below the compilebudget small-domain
    threshold, where COMPILE time on the 1-core CPU hosts — not
    throughput — is the budget (VERDICT r3 #2/#7: the sharded Pippenger
    graph alone cost ~535 s of XLA:CPU compile per process and was the
    graph that kept dry-run stage 2 from ever finishing).

    points (N, 3, 16); scalar_limbs (N, 16) NORMAL-form 16-bit limbs."""
    acc = curve.scalar_mul(points, scalar_limbs)          # (N, 3, 16)
    m = acc.shape[0]
    while m > 1:
        if m % 2:
            acc = jnp.concatenate(
                [acc, jnp.broadcast_to(curve.identity(),
                                       (1,) + acc.shape[1:])], axis=0)
            m += 1
        acc = curve.add(acc[0::2], acc[1::2])
        m //= 2
    return acc[0]


@jax.jit
def msm_small_many(points, scalars_batch):
    """B tiny-N MSMs over the same points: (B, N, 16) -> (B, 3, 16)."""
    return jax.vmap(lambda s: msm_small(points, s))(scalars_batch)


def msm_small_many_mont(points, mont_batch):
    one_raw = jnp.zeros_like(mont_batch).at[..., 0].set(1)
    return msm_small_many(points, FR.mul(mont_batch, one_raw))


def msm_many_mont_aot(points, mont_batch, c: int = 8,
                      scalar_bits: int = SCALAR_BITS):
    """msm_many_mont through its jax.export artifact when present.

    Fresh-process tracing+lowering of ONE batched-MSM graph costs ~200 s
    on the 1-core axon host and the compile-cache load path another
    ~112 s; the deserialized artifact runs in ~3.5 s (utils/aot.py).
    The k=17 prove touches ~5 such graphs — this is most of the round-3
    warmup (VERDICT r3 #1c: 'shrink program count/size')."""
    from ..utils import aot

    key = (f"msm_many_mont_c{c}_sb{scalar_bits}"
           f"_N{points.shape[0]}_B{mont_batch.shape[0]}")
    return aot.call(key,
                    lambda p, m: msm_many_mont(p, m, c, scalar_bits),
                    points, mont_batch)


def msm_mont_aot(points, mont_scalars, c: int = 8,
                 scalar_bits: int = SCALAR_BITS):
    """Single-MSM msm_mont through its jax.export artifact (see above)."""
    from ..utils import aot

    key = (f"msm_mont_c{c}_sb{scalar_bits}_N{points.shape[0]}")
    return aot.call(key,
                    lambda p, s: msm_mont(p, s, c, scalar_bits),
                    points, mont_scalars)


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
