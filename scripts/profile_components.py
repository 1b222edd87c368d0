"""Component-level timing of the MSM/NTT hot paths on the real TPU.

Round-5 instrument for VERDICT r4 #1 ("attack the kernel-overhead
floor"): the roofline (scripts/roofline.py) says NTT runs at 2.9 % VPU
and the chained-scan MSM at 4.6 % — this script breaks one k=17 window
/ transform into its constituent dispatches so the levers can be ranked
by measurement instead of guesswork:

  MSM window:  sort | gather | chain scan | phase-2 agg scan |
               searchsorted+tails | weighted bucket total | Horner
  NTT:         bitrev lane-gather | tail kernel (11 fused stages) |
               head stages | layout moveaxis

Usage: python scripts/profile_components.py   (axon/TPU backend)
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge

ge._enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from zkodst_tpu.ops import curve, msm as msmmod, ntt as nttmod, pycurve
    from zkodst_tpu.ops.field import FR
    from zkodst_tpu.ops.pyfield import FR as PFR
    from zkodst_tpu.pallas import ec

    report = {}
    rng = np.random.default_rng(0)
    N = 1 << 17
    c = 13
    W = msmmod._chain_w(N)
    logn = (N - 1).bit_length()

    pts = curve.from_affine_ints(
        [pycurve.G1.mul(pycurve.G1_GEN, i + 1) for i in range(64)])
    pts = jnp.asarray(np.tile(pts, (N // 64, 1, 1)))
    pts_packed = ec.pack(pts)[0]
    keys = jnp.asarray(rng.integers(0, 1 << c, (N,), np.uint32))

    # --- sort ------------------------------------------------------------
    @jax.jit
    def do_sort(keys):
        packed_k = (keys << np.uint32(logn)) | jnp.arange(N, dtype=jnp.uint32)
        skp = jax.lax.sort(packed_k)
        return skp >> np.uint32(logn), skp & np.uint32((1 << logn) - 1)

    report["sort_2e17"] = {"ms": round(timeit(do_sort, keys) * 1e3, 2)}
    skeys, sidx = do_sort(keys)

    # --- gather ----------------------------------------------------------
    S = N // W
    sidx_p = sidx.reshape(W, S).T.reshape(-1)
    starts = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    starts_p = starts.reshape(W, S).T.reshape(-1)

    @jax.jit
    def do_gather(pp, idx):
        return jnp.take(pp, idx, axis=1)

    report["gather_48x2e17"] = {
        "ms": round(timeit(do_gather, pts_packed, sidx_p) * 1e3, 2)}
    g = do_gather(pts_packed, sidx_p)

    # --- chain scan (phase 1) -------------------------------------------
    @jax.jit
    def do_chain(g, st):
        return msmmod._chain_scan_local(g, st, W)

    report[f"chain_scan_W{W}_S{S}"] = {
        "ms": round(timeit(do_chain, g, starts_p) * 1e3, 2)}
    local = do_chain(g, starts_p)

    # --- phase 2: flat scan over W aggregates ---------------------------
    agg = local[:, (S - 1) * W:]
    aggf = jnp.any(starts_p.reshape(S, W), axis=0)

    @jax.jit
    def do_agg(a, f):
        return msmmod._seg_scan_packed_flat(a, f)

    report[f"agg_flat_scan_W{W}"] = {
        "ms": round(timeit(do_agg, agg, aggf) * 1e3, 2)}

    # --- bucket tails (searchsorted + gathers + carry step) -------------
    @jax.jit
    def do_tails(local, skeys, starts_p, carry):
        nb = 1 << c
        d = jnp.arange(nb, dtype=jnp.uint32)
        right = jnp.searchsorted(skeys, d, side="right")
        left = jnp.concatenate([jnp.zeros((1,), right.dtype), right[:-1]])
        present = right > left
        tj = jnp.maximum(right - 1, 0)
        tl, ts = tj // S, tj % S
        vals = jnp.take(local, ts * W + tl, axis=1)
        sw = starts_p.reshape(W, S)
        fs = jnp.where(jnp.any(sw, axis=1), jnp.argmax(sw, axis=1), S)
        needs = ts < jnp.take(fs, tl)
        cvals = jnp.take(carry, tl, axis=1)
        keep = jnp.logical_not(needs).astype(jnp.uint32)[None, :]
        vals, _ = msmmod._seg_step(vals, cvals, keep, jnp.zeros_like(keep))
        return jnp.where(present[None, :], vals, 0)

    from zkodst_tpu.ops.field import FQ
    idp = np.zeros((48, 1), np.uint32)
    idp[16:32, 0] = FQ.ONE
    carry = jnp.broadcast_to(jnp.asarray(idp), (48, W))
    report["bucket_tails_c13"] = {
        "ms": round(timeit(do_tails, local, skeys, starts_p, carry) * 1e3, 2)}
    buckets = do_tails(local, skeys, starts_p, carry)

    # --- weighted bucket total (2 packed seg scans over 2^13 lanes) ------
    @jax.jit
    def do_weighted(b):
        return msmmod._weighted_total_packed(b)

    report["weighted_total_2e13"] = {
        "ms": round(timeit(do_weighted, buckets) * 1e3, 2)}

    # --- Horner combine over 20 windows ---------------------------------
    win_sums = jnp.asarray(
        np.tile(np.asarray(curve.from_affine_ints(
            [pycurve.G1.mul(pycurve.G1_GEN, 7)])), (20, 1, 1)))

    @jax.jit
    def do_horner(ws):
        def combine(acc, s):
            for _ in range(c):
                acc = curve.double(acc)
            return curve.add(acc, s), None
        acc, _ = jax.lax.scan(combine, ws[-1], ws[:-1][::-1])
        return acc

    report["horner_20win_c13"] = {
        "ms": round(timeit(do_horner, win_sums) * 1e3, 2)}

    # --- whole MSM for reference ----------------------------------------
    scal = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), np.uint32))
    f = jax.jit(lambda p, s: msmmod.msm(p, s, c))
    report["msm_full_c13"] = {"ms": round(timeit(f, pts, scal, iters=3) * 1e3, 1)}

    # ========================= NTT ======================================
    k = 17
    nn = 1 << k
    w = PFR.root_of_unity(k)
    B = 8
    from zkodst_tpu.pallas import ntt as pntt

    stack = jnp.asarray(rng.integers(0, 1 << 32, (B, nn, 16)), jnp.uint32)
    xt = jnp.moveaxis(stack, -1, 1)                      # (B, 16, n)
    rev, tail_tw, heads = pntt._plan(FR, nn, w)

    @jax.jit
    def do_moveaxis(a):
        return jnp.moveaxis(a, -1, 1)

    report["ntt_moveaxis_in"] = {
        "ms": round(timeit(do_moveaxis, stack) * 1e3, 2)}

    @jax.jit
    def do_bitrev(x, r):
        return jnp.take(x, r, axis=2)

    report["ntt_bitrev_gather"] = {
        "ms": round(timeit(do_bitrev, xt, rev) * 1e3, 2)}

    # tail kernel alone
    from jax.experimental import pallas as pl
    T = pntt.TILE
    stages = min(pntt.HEAD_MIN, T).bit_length() - 1
    p_limbs = tuple(int(v) for v in FR.P)
    pinv16 = np.uint32(FR.pinv16)

    @jax.jit
    def do_tail(x, tw):
        return pl.pallas_call(
            partial(pntt._tail_kernel, p_limbs, pinv16, stages),
            out_shape=jax.ShapeDtypeStruct((B, 16, nn), jnp.uint32),
            grid=(B, nn // T),
            in_specs=[
                pl.BlockSpec((1, 16, T), lambda b, cc: (b, 0, cc)),
                pl.BlockSpec((tw.shape[0], 16, T), lambda b, cc: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 16, T), lambda b, cc: (b, 0, cc)),
        )(x, tw)

    report["ntt_tail_11stages"] = {
        "ms": round(timeit(do_tail, xt, tail_tw) * 1e3, 2)}

    # head stages together (from h = HEAD_MIN, grouped blocks)
    @jax.jit
    def do_heads(x, *tws):
        h = min(pntt.HEAD_MIN, T)
        for tw in tws:
            nb = nn // (2 * h)
            xv = x.reshape(B, 16, nb, 2, h)
            Ta = min(h, T)
            G = max(1, min(nb, T // (2 * h)))
            x = pl.pallas_call(
                partial(pntt._head_kernel, p_limbs, pinv16),
                out_shape=jax.ShapeDtypeStruct((B, 16, nb, 2, h), jnp.uint32),
                grid=(B, nb // G, h // Ta),
                in_specs=[
                    pl.BlockSpec((1, 16, G, 2, Ta),
                                 lambda b, i, j: (b, 0, i, 0, j)),
                    pl.BlockSpec((16, Ta), lambda b, i, j: (0, j)),
                ],
                out_specs=pl.BlockSpec((1, 16, G, 2, Ta),
                                       lambda b, i, j: (b, 0, i, 0, j)),
            )(xv, tw).reshape(B, 16, nn)
            h *= 2
        return x

    report["ntt_head_stages"] = {
        "n_stages": len(heads),
        "ms": round(timeit(do_heads, xt, *heads) * 1e3, 2)}

    fntt = jax.jit(lambda s: nttmod.ntt(FR, s, w))
    report["ntt_full_B8"] = {"ms": round(timeit(fntt, stack, iters=5) * 1e3, 1)}

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
