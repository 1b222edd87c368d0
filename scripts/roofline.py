"""Roofline measurement: hot kernels vs v5e peaks (VERDICT r3 ask #10).

Measures, on the real TPU, the three kernel families that dominate the
prove (SURVEY.md §5.1/§7 step 6) and prints one JSON blob for
docs/PERF.md:

  * Pallas Montgomery mulmod (pallas/mulmod.py): field muls/s and the
    HBM traffic they imply (3 × 64 B per mul: two operands + result).
  * Pallas NTT (pallas/ntt.py): k=17 transforms/s (batch-amortized);
    HBM traffic ≈ 2 passes × 8 MB per stage × 17 stages.
  * Chained-scan Pippenger MSM (ops/msm.py): one full-width 2^17 MSM,
    and the per-window floor.

Denominators (v5e, public): HBM bandwidth 819 GB/s; VPU integer ALU
throughput estimated as 8 × 128 lanes × 4 ops/cycle × 940 MHz ≈ 3.85
T u32-ops/s (the MXU does not run u32 ZK field math — the VPU is the
compute roof for this workload).

Usage: python scripts/roofline.py   (on the axon/TPU backend)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge

ge._enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBS = 819.0
VPU_TOPS = 3.85e12


def _sync(out):
    """block_until_ready lies on the axon relay (reports ready while the
    device still computes — docs/PERF.md); a 1-element device→host pull
    through a dependent slice is a true barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from zkodst_tpu.ops.field import FR
    from zkodst_tpu.ops import msm as msmmod
    from zkodst_tpu.ops import ntt as nttmod
    from zkodst_tpu.ops import curve, pycurve
    from zkodst_tpu.ops.pyfield import FR as PFR

    report = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)

    # --- mulmod ------------------------------------------------------------
    n = 1 << 21
    a = jnp.asarray(rng.integers(0, 1 << 32, (n, 16)), dtype=jnp.uint32)
    b = jnp.asarray(rng.integers(0, 1 << 32, (n, 16)), dtype=jnp.uint32)
    mul = jax.jit(FR.mul)
    dt = timeit(mul, a, b)
    muls_s = n / dt
    gbs = muls_s * 3 * 64 / 1e9
    report["mulmod"] = {
        "n": n, "ms": round(dt * 1e3, 3),
        "muls_per_s": round(muls_s / 1e6, 1),
        "hbm_gb_s": round(gbs, 1),
        "hbm_util_pct": round(100 * gbs / HBM_GBS, 1),
        # one CIOS mul ≈ 16 iter × (16 mul + 32 add/shift) ≈ 770 u32 ops
        "vpu_util_pct": round(100 * muls_s * 770 / VPU_TOPS, 1),
    }

    # --- NTT k=17 ----------------------------------------------------------
    k = 17
    nn = 1 << k
    w = PFR.root_of_unity(k)
    B = 8
    stack = jnp.asarray(
        rng.integers(0, 1 << 32, (B, nn, 16)), dtype=jnp.uint32)
    f = jax.jit(lambda s: nttmod.ntt(FR, s, w))
    dt = timeit(f, stack, iters=5)
    per = dt / B
    # per stage: read+write the full (n, 16) tensor = 2 × 8 MB
    gbs = k * 2 * (nn * 64) / per / 1e9
    # butterflies: n/2 per stage, each ~1 mul + 2 add ≈ 770 + 2×48 ops
    ops = k * (nn / 2) * (770 + 96) / per
    report["ntt_k17"] = {
        "batch": B, "ms_per_transform": round(per * 1e3, 2),
        "transforms_per_s": round(1 / per, 1),
        "hbm_gb_s": round(gbs, 1),
        "hbm_util_pct": round(100 * gbs / HBM_GBS, 1),
        "vpu_util_pct": round(100 * ops / VPU_TOPS, 1),
    }

    # --- witness kernel (VERDICT r4 weak #5 / ask #8) -----------------------
    from zkodst_tpu.ops import blake2, u64
    v = blake2.EIP152_VECTOR
    Bw = 8192
    hw = jnp.asarray(np.broadcast_to(u64.from_ints(v["h"]), (Bw, 8, 2)))
    mw = jnp.asarray(np.broadcast_to(u64.from_ints(v["m"]), (Bw, 16, 2)))
    tw = jnp.asarray(np.broadcast_to(u64.from_ints(v["t"]), (Bw, 2, 2)))
    fw = jnp.ones((Bw,), jnp.bool_)
    step = jax.jit(lambda h, m, t, f: blake2.blake2f(h, m, t, f, 12))
    dt = timeit(step, hw, mw, tw, fw)
    # static u32-op count per compression (same model as bench.py):
    # 12 rounds x 2 vectorized G-steps x 4 u64 lanes x ~76 u32 ops/lane
    # + schedule gather/finalize ~= 8.2e3 u32 ops
    comp_s = Bw / dt
    report["witness_blake2f"] = {
        "batch": Bw, "compressions_per_s": round(comp_s, 1),
        "vpu_util_pct": round(100 * comp_s * 8.2e3 / VPU_TOPS, 2),
    }

    # --- MSM 2^17 ----------------------------------------------------------
    N = 1 << 17
    pts = curve.from_affine_ints(
        [pycurve.G1.mul(pycurve.G1_GEN, i + 1) for i in range(64)])
    pts = np.tile(pts, (N // 64, 1, 1))
    scal = np.asarray(rng.integers(0, 1 << 16, (N, 16)), np.uint32)
    ptsd = jnp.asarray(pts)
    scald = jnp.asarray(scal)
    f = jax.jit(lambda p, s: msmmod.msm(p, s, 13))
    dt = timeit(f, ptsd, scald, iters=3)
    nwin = (254 + 12) // 13
    # information floor: 1 complete EC add (12 muls ≈ 12×770 u32 ops +
    # ~30 adds×48) per element per window
    ops = nwin * N * (12 * 770 + 30 * 48) / dt
    report["msm_2e17_c13"] = {
        "ms": round(dt * 1e3, 1),
        "ms_per_window_scan": round(dt * 1e3 / nwin, 2),
        "windows": nwin,
        "vpu_util_pct_at_1add_per_elem": round(100 * ops / VPU_TOPS, 1),
    }

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
