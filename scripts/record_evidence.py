"""One-process evidence recorder: PP-overlap A/B + IPA k=17 timing.

Two VERDICT r2 items need *recorded numbers* rather than new code:

* weak #7 — the phase-overlap (PP) schedule exists (`prover.py`
  pre_intt / early lookup argsorts; `ZKODST_NO_OVERLAP=1` restores the
  bunched schedule) but its win was never measured. The knob is read per
  prove call, so one process can time both schedules on identical warm
  executables.
* weak #6 — the IPA backend (`scripts/run_ipa_k17.py` logic inlined
  here) needs a recorded prove/verify wall-clock at the flagship k=17
  configuration.

Running everything in ONE process matters on the axon relay: per-process
executable loading costs tens of minutes even on full compile-cache hits
(docs/PERF.md), so separate scripts would re-pay that per experiment.

Usage: python scripts/record_evidence.py [--skip-ipa]   (TPU host, after
bench.py has warmed .jax_cache_tpu / .zkodst_cache)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as _ge  # noqa: E402

_ge._enable_compile_cache()

import jax  # noqa: E402

from zkodst_tpu import api  # noqa: E402


def timed_proves(pipe, h, m, t, f, n, seed0):
    times = []
    proof = inst = None
    for i in range(n):
        t0 = time.perf_counter()
        proof, inst = pipe.prove(h, m, t, f, seed=seed0 + i)
        times.append(round(time.perf_counter() - t0, 2))
    return times, proof, inst


def _write(out: dict) -> None:
    with open(os.path.join(REPO, "docs", "evidence_r4.json"), "w") as fh:
        json.dump(out, fh, indent=1)


def main() -> None:
    out = {}
    n_inst = 37

    # --- KZG pipeline: PP overlap A/B -----------------------------------
    t0 = time.time()
    pipe = api.setup_blake2f(k=17, n_inst=n_inst, cache_dir=".zkodst_cache",
                             echo=False)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    print(f"kzg setup {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    pipe.prove(h, m, t, f, seed=1)                      # warm-up
    print(f"kzg warmup prove {time.time() - t0:.0f}s", flush=True)

    # >= 5 warm samples per arm (VERDICT r3 weak #6: n=3 on a contended
    # host was too noisy to cite)
    on, proof_on, inst = timed_proves(pipe, h, m, t, f, 5, seed0=2)
    assert pipe.verify(inst, proof_on)
    print(f"overlap ON : {on}", flush=True)
    os.environ["ZKODST_NO_OVERLAP"] = "1"
    off, proof, inst = timed_proves(pipe, h, m, t, f, 5, seed0=2)
    assert pipe.verify(inst, proof)
    del os.environ["ZKODST_NO_OVERLAP"]
    # the overlap schedule only reorders device dispatches — same seed must
    # give byte-identical proofs in both modes
    assert proof == proof_on, "overlap schedule changed proof bytes"
    print(f"overlap OFF: {off}", flush=True)
    import statistics

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

    # --- IPA backend at k=17 --------------------------------------------
    if "--skip-ipa" not in sys.argv:
        # the KZG pipeline holds ~2 GB of device state (SRS bases, static
        # extended tables); free it before the IPA setup or the two
        # pipelines together exhaust HBM (observed RESOURCE_EXHAUSTED)
        del pipe
        import gc

        gc.collect()
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
        times, proof, inst = timed_proves(ipa, h, m, t, f, 2, seed0=2)
        t0 = time.time()
        ok = ipa.verify(inst, proof)
        verify_s = time.time() - t0
        assert ok, "IPA k=17 proof failed verification"
        out["ipa_k17"] = {
            "instances": ipa.n_inst, "proof_bytes": len(proof),
            "setup_s": round(setup_s, 1), "warmup_prove_s": round(warm_s, 1),
            "prove_s": min(times), "all_proves": times,
            "verify_s": round(verify_s, 2),
            "phases": {p.label: round(p.seconds, 2)
                       for p in ipa.metrics.phases
                       if p.label.startswith("prove.")},
        }
        print(json.dumps({"metric": "blake2f_ipa_prove", **out["ipa_k17"]}),
              flush=True)

    _write(out)
    print("evidence written to docs/evidence_r4.json", flush=True)


if __name__ == "__main__":
    main()
