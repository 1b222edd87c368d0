"""Golden-proof format pin (docs/FORMAT.md; VERDICT r1 #6).

Re-proves the toy circuit with the fixture's seeds and asserts BYTE
equality against the committed proof — silent proof-format drift between
rounds breaks here first. On an intentional format bump: regenerate with
`python tests/make_golden.py` and record the change in docs/FORMAT.md.
"""

import json
import os

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
