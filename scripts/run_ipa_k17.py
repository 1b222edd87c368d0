"""IPA backend at the flagship scale: k=17 prove + verify timing.

The reference's second proof system (zcash-halo2 IPA — SURVEY.md §1 L0,
/root/reference/blake2f-circuit/benches/blake2f.rs:83-151) driven at the
same k=17 / 37-instance configuration as the KZG headline. Records the
numbers VERDICT r2 weak #6 called missing; results land in docs/PERF.md.

Usage: python scripts/run_ipa_k17.py [n_inst]   (TPU host; ~compile-heavy
first run, cached afterwards in .jax_cache_tpu)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache_tpu"
                               if jax.default_backend() != "cpu"
                               else ".jax_cache"))
jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*/")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from zkodst_tpu import api  # noqa: E402


def main() -> None:
    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 37
    t0 = time.time()
    pipe = api.setup_blake2f(k=17, n_inst=n_inst, cache_dir=".zkodst_cache",
                             echo=False, scheme="ipa")
    setup_s = time.time() - t0
    print(f"ipa setup {setup_s:.0f}s", flush=True)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    t0 = time.time()
    proof, inst = pipe.prove(h, m, t, f, seed=1)
    warm_s = time.time() - t0
    print(f"ipa warmup prove {warm_s:.0f}s ({len(proof)} bytes)", flush=True)
    t0 = time.time()
    proof, inst = pipe.prove(h, m, t, f, seed=2)
    prove_s = time.time() - t0
    print(f"ipa prove {prove_s:.1f}s", flush=True)
    t0 = time.time()
    ok = pipe.verify(inst, proof)
    verify_s = time.time() - t0
    assert ok, "IPA k=17 proof failed verification"
    print(json.dumps({
        "metric": "blake2f_ipa_prove",
        "k": 17, "instances": pipe.n_inst,
        "proof_bytes": len(proof),
        "setup_s": round(setup_s, 1),
        "warmup_prove_s": round(warm_s, 1),
        "prove_s": round(prove_s, 2),
        "verify_s": round(verify_s, 2),
        "phases": {p.label: round(p.seconds, 2)
                   for p in pipe.metrics.phases
                   if p.label.startswith("prove.")},
    }), flush=True)


if __name__ == "__main__":
    main()
