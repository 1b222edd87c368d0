"""Round-5 evidence recorder: PP A/B, IPA k=17, and the k=18 batching leg.

VERDICT r4 asks (#2, #3, #6): the 1024-instance BASELINE configs with a
k=18 row (74 instances/proof — is per-proof overhead amortized?), the
IPA leg re-timed after the constant-shape fold rewrite (proof/ipa.py
_open_poly_fixed_shape), and ≥5 samples behind every headline number.

One process on the axon relay (per-process executable loading costs
minutes even on full cache hits — docs/PERF.md).

Usage: python scripts/record_evidence_r5.py [--skip-ipa] [--skip-k18]
       (TPU host, after bench.py has warmed .jax_cache_tpu/.zkodst_cache)
"""

import gc
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as _ge  # noqa: E402

_ge._enable_compile_cache()

import jax  # noqa: E402

from zkodst_tpu import api  # noqa: E402

OUT_PATH = os.path.join(REPO, "docs", "evidence_r5.json")


def timed_proves(pipe, h, m, t, f, n, seed0):
    times = []
    proof = inst = None
    for i in range(n):
        t0 = time.perf_counter()
        proof, inst = pipe.prove(h, m, t, f, seed=seed0 + i)
        times.append(round(time.perf_counter() - t0, 2))
    return times, proof, inst


def _write(out: dict) -> None:
    prev = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as fh:
            prev = json.load(fh)
    prev.update(out)
    with open(OUT_PATH, "w") as fh:
        json.dump(prev, fh, indent=1)


def _phase_summary(pipe):
    return {p.label: round(p.seconds, 2) for p in pipe.metrics.phases
            if p.label.startswith("prove.")}


def main() -> None:
    out = {}
    n_inst = 37

    # --- KZG k=17: PP overlap A/B + headline samples ---------------------
    t0 = time.time()
    pipe = api.setup_blake2f(k=17, n_inst=n_inst, cache_dir=".zkodst_cache",
                             echo=False)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    print(f"kzg setup {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    pipe.prove(h, m, t, f, seed=1)                      # warm-up
    print(f"kzg warmup prove {time.time() - t0:.0f}s", flush=True)

    on, proof_on, inst = timed_proves(pipe, h, m, t, f, 5, seed0=2)
    assert pipe.verify(inst, proof_on)
    print(f"overlap ON : {on}", flush=True)
    os.environ["ZKODST_NO_OVERLAP"] = "1"
    off, proof, inst = timed_proves(pipe, h, m, t, f, 5, seed0=2)
    assert pipe.verify(inst, proof)
    del os.environ["ZKODST_NO_OVERLAP"]
    assert proof == proof_on, "overlap schedule changed proof bytes"
    print(f"overlap OFF: {off}", flush=True)
    out["k17_prove"] = {
        "instances": n_inst, "timed_proves_s": on,
        "median_prove_s": statistics.median(on),
        "best_prove_s": min(on),
        "instances_per_s": round(n_inst / min(on), 2),
        "phases": _phase_summary(pipe),
    }
    out["pp_overlap_ab"] = {
        "overlap_on_s": min(on), "overlap_off_s": min(off),
        "win_pct": round(100 * (min(off) - min(on)) / min(off), 1),
        "median_on_s": statistics.median(on),
        "median_off_s": statistics.median(off),
        "median_win_pct": round(100 * (statistics.median(off)
                                       - statistics.median(on))
                                / statistics.median(off), 1),
        "all_on": on, "all_off": off,
    }
    print(json.dumps({"metric": "pp_overlap_ab", **out["pp_overlap_ab"]}),
          flush=True)
    _write(out)

    # --- k=18: batching amortization (BASELINE configs 3–4) --------------
    if "--skip-k18" not in sys.argv:
        del pipe
        gc.collect()
        t0 = time.time()
        pipe18 = api.setup_blake2f(k=18, n_inst=74,
                                   cache_dir=".zkodst_cache", echo=False)
        setup_s = time.time() - t0
        print(f"k18 setup {setup_s:.0f}s", flush=True)
        h, m, t, f = api.eip152_inputs(pipe18.n_inst)
        t0 = time.time()
        pipe18.prove(h, m, t, f, seed=1)
        warm_s = time.time() - t0
        print(f"k18 warmup prove {warm_s:.0f}s", flush=True)
        times, proof, inst = timed_proves(pipe18, h, m, t, f, 5, seed0=2)
        assert pipe18.verify(inst, proof), "k18 proof failed verification"
        print(f"k18 timed: {times}", flush=True)
        # DP over time to >= 1024 total instances (warmup + timed count:
        # they are real verified proves of the same instances)
        done = 6
        need = max(0, -(-1024 // 74) - done)
        t0 = time.time()
        for i in range(need):
            proof, inst = pipe18.prove(h, m, t, f, seed=100 + i)
        dp_wall = time.time() - t0 + warm_s + sum(times)
        assert pipe18.verify(inst, proof)
        total = (need + done) * 74
        out["k18_prove"] = {
            "instances_per_proof": 74, "setup_s": round(setup_s, 1),
            "warmup_prove_s": round(warm_s, 1),
            "timed_proves_s": times,
            "median_prove_s": statistics.median(times),
            "best_prove_s": min(times),
            "instances_per_s": round(74 / min(times), 2),
            "phases": _phase_summary(pipe18),
            "dp_scale": {"proofs": need + done, "instances_total": total,
                         "wall_s": round(dp_wall, 1),
                         "instances_per_s": round(total / dp_wall, 2)},
        }
        print(json.dumps({"metric": "blake2f_k18_prove",
                          **out["k18_prove"]}), flush=True)
        _write(out)
        del pipe18
        gc.collect()
        pipe = None
    else:
        del pipe
        gc.collect()

    # --- IPA backend at k=17 (post constant-shape fold rewrite) ----------
    if "--skip-ipa" not in sys.argv:
        h, m, t, f = api.eip152_inputs(n_inst)
        t0 = time.time()
        ipa = api.setup_blake2f(k=17, n_inst=n_inst,
                                cache_dir=".zkodst_cache", echo=False,
                                scheme="ipa")
        setup_s = time.time() - t0
        print(f"ipa setup {setup_s:.0f}s", flush=True)
        t0 = time.time()
        proof, inst = ipa.prove(h, m, t, f, seed=1)     # warm-up
        warm_s = time.time() - t0
        print(f"ipa warmup prove {warm_s:.0f}s ({len(proof)} B)", flush=True)
        times, proof, inst = timed_proves(ipa, h, m, t, f, 5, seed0=2)
        vtimes = []
        for _ in range(3):
            t0 = time.time()
            ok = ipa.verify(inst, proof)
            vtimes.append(round(time.time() - t0, 2))
            assert ok, "IPA k=17 proof failed verification"
        out["ipa_k17"] = {
            "instances": ipa.n_inst, "proof_bytes": len(proof),
            "setup_s": round(setup_s, 1), "warmup_prove_s": round(warm_s, 1),
            "prove_s": min(times), "all_proves": times,
            "median_prove_s": statistics.median(times),
            "verify_s": min(vtimes), "all_verifies": vtimes,
            "phases": _phase_summary(ipa),
        }
        print(json.dumps({"metric": "blake2f_ipa_prove", **out["ipa_k17"]}),
              flush=True)

    _write(out)
    print(f"evidence written to {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
