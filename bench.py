"""Driver benchmark: one JSON line with the headline metric.

Default: the full keygen→prove pipeline at k=17 (BASELINE.md config 2) on
the TPU — proofs/second, with vs_baseline measured against this repo's
first working (unoptimized) prover at 809.6 s/proof, since the reference
never recorded numbers (BASELINE.md). Uses the on-disk SRS/pk caches and
the persistent compile cache, so warm rounds measure runtime, not compiles.

Fallback (no TPU / ZKODST_BENCH=witness): batched BLAKE2f witness
throughput vs the single-thread Python oracle.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# first-working-prover wall clock (s/proof, k=17, n_inst=1, v5e) — the
# self-baseline all later rounds are measured against
BASELINE_PROVE_S = 809.6


def bench_witness() -> dict:
    import jax

    from zkodst_tpu.ops import blake2, u64

    v = blake2.EIP152_VECTOR
    B = 8192
    h = np.broadcast_to(u64.from_ints(v["h"]), (B, 8, 2))
    m = np.broadcast_to(u64.from_ints(v["m"]), (B, 16, 2))
    t = np.broadcast_to(u64.from_ints(v["t"]), (B, 2, 2))
    f = np.ones((B,), np.bool_)
    step = jax.jit(lambda h, m, t, f: blake2.blake2f(h, m, t, f, 12))
    np.asarray(step(h, m, t, f))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(h, m, t, f)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    hs, ms = list(v["h"]), list(v["m"])
    t0 = time.perf_counter()
    for _ in range(50):
        blake2.blake2f_py(hs, ms, v["t"], v["f"])
    py_tput = 50 / (time.perf_counter() - t0)
    return {
        "metric": "blake2f_witness_throughput",
        "value": round(B / dt, 1),
        "unit": "compressions/s",
        "vs_baseline": round(B / dt / py_tput, 2),
    }


def bench_prove() -> dict:
    """Timed = best of N_TIMED warm proves (a loaded 1-core host or relay
    contention can inflate any single prove several-fold — round 1's driver
    run recorded 517 s for a prove that repeats at 58 s; best-of-N plus the
    embedded per-phase/diagnostic tail makes the discrepancy visible from
    the JSON alone)."""
    import jax

    repo = os.path.dirname(os.path.abspath(__file__))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from zkodst_tpu import api

    B = int(os.environ.get("ZKODST_BENCH_INSTANCES", "37"))
    n_timed = int(os.environ.get("ZKODST_BENCH_REPEATS", "2"))
    srs_cached = os.path.exists(
        os.path.join(repo, ".zkodst_cache", "srs_bn254_k17.npz"))
    t0 = time.perf_counter()
    pipe = api.setup_blake2f(k=17, n_inst=B, cache_dir=".zkodst_cache",
                             echo=False)
    setup_s = time.perf_counter() - t0
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    t0 = time.perf_counter()
    pipe.prove(h, m, t, f, seed=1)            # warm-up (pays any compiles)
    warmup_s = time.perf_counter() - t0
    times, proof, inst = [], None, None
    from zkodst_tpu.utils.timing import profiler_trace

    for i in range(n_timed):
        # ZKODST_PROFILE=<dir>: capture a Perfetto/XPlane device trace of
        # the LAST timed prove (per-kernel timeline — SURVEY.md §5.1)
        prof_dir = (os.environ.get("ZKODST_PROFILE")
                    if i == n_timed - 1 else None)
        t0 = time.perf_counter()
        with profiler_trace(prof_dir):
            proof, inst = pipe.prove(h, m, t, f, seed=2 + i)
        times.append(round(time.perf_counter() - t0, 2))
    dt = min(times)
    t0 = time.perf_counter()
    assert pipe.verify(inst, proof), "benchmark proof failed verification"
    verify_s = time.perf_counter() - t0
    mock_s = _flagship_circuit_check(pipe, h, m, t, f)
    phases = {}
    for ph in pipe.metrics.phases:          # keep the LAST timed prove's
        if ph.label.startswith("prove."):
            phases[ph.label[len("prove."):]] = round(ph.seconds, 2)
    return {
        "metric": "blake2f_prove_throughput",
        "value": round(pipe.n_inst / dt, 4),
        "unit": "instances/s",
        # vs the first working prover: 1 instance per 809.6 s
        "vs_baseline": round((pipe.n_inst / dt) * BASELINE_PROVE_S, 1),
        "diag": {
            "instances_per_proof": pipe.n_inst,
            "setup_s": round(setup_s, 1),
            "warmup_prove_s": round(warmup_s, 1),
            "timed_proves_s": times,
            "verify_s": round(verify_s, 3),
            "srs_cache_hit": srs_cached,
            "last_prove_phases_s": phases,
            "mock_check_s": mock_s,
        },
    }


def _flagship_circuit_check(pipe, h, m, t, f) -> float:
    """Driver-visible k=17 circuit regression gate: the mock (MockProver-
    equivalent) check must pass on the honest witness and FAIL on a
    corrupted cell — a gate/witness-generator regression breaks the bench
    run instead of shipping invisibly. EIP-152 parity is implied: the
    witness binds the digest to the instance column via copy constraints
    (checked here) and the proof above verified against that instance."""
    import numpy as np

    from zkodst_tpu.circuit import mock

    t0 = time.perf_counter()
    adv, inst = pipe.witness(h, m, t, f)
    adv = {k: np.asarray(v) for k, v in adv.items()}
    inst = {k: np.asarray(v) for k, v in inst.items()}
    assert mock.check(pipe.built.circ, adv, inst) == [], \
        "flagship circuit mock check FAILED on the honest witness"
    col = pipe.built.circ.advice_names[0]
    rows = np.nonzero(adv[col][:, 0])[0]
    bad = {k: (v.copy() if k == col else v) for k, v in adv.items()}
    bad[col][int(rows[len(rows) // 2]), 0] ^= 1
    assert mock.check(pipe.built.circ, bad, inst), \
        "mock check MISSED a corrupted witness cell (negative test)"
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    mode = os.environ.get("ZKODST_BENCH", "auto")
    result = None
    if mode in ("auto", "prove"):
        try:
            import jax

            if jax.default_backend() in ("tpu", "axon"):
                result = bench_prove()
        except Exception as e:  # noqa: BLE001 — fall back, report metric
            if mode == "prove":
                raise
            print(f"# prove bench unavailable ({type(e).__name__}: {e}); "
                  "falling back to witness metric", flush=True)
    if result is None:
        result = bench_witness()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
