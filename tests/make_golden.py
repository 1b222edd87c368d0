"""Regenerate the golden-proof fixture (docs/FORMAT.md — run ONLY on an
intentional format bump, then commit the new fixture + a FORMAT.md entry).

Usage: python tests/make_golden.py
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*/")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import test_circuit_ir as toy  # noqa: E402
from zkodst_tpu.proof import keygen, prover, srs, verifier  # noqa: E402
from zkodst_tpu.proof.transcript import Blake2bWrite  # noqa: E402

SRS_SEED = 2
BLIND_SEED = 42


def main() -> None:
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=SRS_SEED)
    pk = keygen.keygen(params, circ, msm_window=4)
    proof = prover.create_proof(params, pk, toy.good_witness(), {},
                                seed=BLIND_SEED)
    assert verifier.verify_proof(params, pk.vk, {}, proof)
    tw = Blake2bWrite()
    pk.vk.hash_into(tw)
    vk_digest = tw.squeeze_challenge()
    out = {
        "format_version": 1,
        "circuit": "toy k=5 (tests/test_circuit_ir.py)",
        "srs_seed": SRS_SEED,
        "blind_seed": BLIND_SEED,
        "proof_hex": proof.hex(),
        "proof_sha256": hashlib.sha256(proof).hexdigest(),
        "vk_transcript_digest": hex(vk_digest),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "toy_proof_v1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path} ({len(proof)} proof bytes)")


if __name__ == "__main__":
    main()
