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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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


if __name__ == "__main__":
    main()
