"""Golden-proof format pin (docs/FORMAT.md; VERDICT r1 #6).

Re-proves the toy circuit with the fixture's seeds and asserts BYTE
equality against the committed proof — silent proof-format drift between
rounds breaks here first. On an intentional format bump: regenerate with
`python tests/make_golden.py` and record the change in docs/FORMAT.md.
"""

import json
import os

import pytest

import test_circuit_ir as toy
from zkodst_tpu.proof import keygen, prover, srs, verifier
from zkodst_tpu.proof.transcript import Blake2bWrite

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "toy_proof_v1.json")


def test_golden_proof_bytes():
    with open(GOLDEN) as fh:
        g = json.load(fh)
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=g["srs_seed"])
    pk = keygen.keygen(params, circ, msm_window=4)
    tw = Blake2bWrite()
    pk.vk.hash_into(tw)
    assert hex(tw.squeeze_challenge()) == g["vk_transcript_digest"], \
        "verifying-key transcript digest drifted (keygen/commit change?)"
    proof = prover.create_proof(params, pk, toy.good_witness(), {},
                                seed=g["blind_seed"])
    assert proof.hex() == g["proof_hex"], \
        "proof bytes drifted from the golden fixture — see docs/FORMAT.md " \
        "before regenerating"
    assert verifier.verify_proof(params, pk.vk, {}, proof)


@pytest.mark.slow
def test_flagship_halo2ce_golden():
    """Flagship-scale (k=17, 37 inst) halo2ce-mode pin (VERDICT r4 #7 —
    the compat mode was previously pinned at toy k=5 only). Slow-marked:
    the k=17 prove is TPU-scale; the driver-visible gate is bench.py's
    halo2ce_golden diag."""
    import hashlib

    from zkodst_tpu import api

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", "flagship_proof_halo2ce_v1.json")
    if not os.path.exists(path):
        pytest.skip("fixture not yet generated "
                    "(scripts/make_flagship_golden.py)")
    with open(path) as fh:
        g = json.load(fh)
    pipe = api.setup_blake2f(k=17, n_inst=37, cache_dir=".zkodst_cache",
                             echo=False)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    proof, inst = pipe.prove(h, m, t, f, seed=g["blind_seed"],
                             transcript_mode="halo2ce")
    assert hashlib.sha256(proof).hexdigest() == g["proof_sha256"]
    assert pipe.verify(inst, proof, transcript_mode="halo2ce")
