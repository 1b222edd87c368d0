"""Full keygen → create_proof → verify_proof over the IPA backend.

The reference's second proof-system stack is zcash-halo2 IPA
(/root/reference/blake2f-circuit/benches/blake2f.rs:83-151; SURVEY.md §1
L0). Same pipeline as tests/test_prove_verify.py, dispatched through
proof/pcs.py onto the transparent-setup commitment scheme."""

import numpy as np
import pytest

import test_circuit_ir as toy
from zkodst_tpu.proof import ipa, keygen, prover, verifier


@pytest.fixture(scope="module")
def setup():
    circ = toy.toy_circuit()
    params = ipa.setup(circ.k)
    pk = keygen.keygen(params, circ, msm_window=4)
    return circ, params, pk


def test_ipa_prove_and_verify(setup):
    circ, params, pk = setup
    proof = prover.create_proof(params, pk, toy.good_witness(), {}, seed=3)
    assert len(proof) > 200
    assert verifier.verify_proof(params, pk.vk, {}, proof)


def test_ipa_proof_tamper_rejected(setup):
    circ, params, pk = setup
    proof = prover.create_proof(params, pk, toy.good_witness(), {}, seed=4)
    for pos in (0, len(proof) // 2, len(proof) - 1):
        bad = bytearray(proof)
        bad[pos] ^= 1
        assert not verifier.verify_proof(params, pk.vk, {}, bytes(bad)), \
            f"flip at {pos} accepted"


def test_ipa_bad_witness_rejected(setup):
    circ, params, pk = setup
    w = toy.good_witness()
    w["b"][3] = toy.u64.from_int(999)  # violates the square gate
    proof = prover.create_proof(params, pk, w, {}, seed=5)
    assert not verifier.verify_proof(params, pk.vk, {}, proof)


def test_ipa_deterministic_per_seed(setup):
    circ, params, pk = setup
    p1 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=6)
    p2 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=6)
    p3 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=7)
    assert p1 == p2
    assert p1 != p3
    assert verifier.verify_proof(params, pk.vk, {}, p3)


def test_kzg_proof_rejected_by_ipa_params(setup):
    """Cross-scheme confusion must fail closed: a KZG proof replayed
    against IPA params (different vk commitments → different transcript)
    rejects."""
    from zkodst_tpu.proof import srs

    circ, params, pk = setup
    kzg_params = srs.setup(circ.k, seed=2)
    kzg_pk = keygen.keygen(kzg_params, circ, msm_window=4)
    proof = prover.create_proof(kzg_params, kzg_pk, toy.good_witness(), {},
                                seed=3)
    assert verifier.verify_proof(kzg_params, kzg_pk.vk, {}, proof)
    assert not verifier.verify_proof(params, pk.vk, {}, proof)
