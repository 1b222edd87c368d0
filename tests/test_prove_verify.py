"""End-to-end keygen → create_proof → verify_proof on the toy circuit.

Small-k analogue of the reference's bench pipeline
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:23-102), with the
negative cases the reference never had: flipped proof bytes and a corrupted
witness must fail verification."""

import numpy as np
import pytest

import test_circuit_ir as toy
from zkodst_tpu.proof import keygen, prover, srs, verifier


@pytest.fixture(scope="module")
def setup():
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=2)
    pk = keygen.keygen(params, circ, msm_window=4)
    return circ, params, pk


def test_prove_and_verify(setup):
    circ, params, pk = setup
    proof = prover.create_proof(params, pk, toy.good_witness(), {}, seed=3)
    assert len(proof) > 200
    assert verifier.verify_proof(params, pk.vk, {}, proof)


def test_proof_bytes_tamper_rejected(setup):
    circ, params, pk = setup
    proof = bytearray(prover.create_proof(params, pk, toy.good_witness(), {},
                                          seed=4))
    for pos in (0, len(proof) // 2, len(proof) - 1):
        bad = bytearray(proof)
        bad[pos] ^= 1
        assert not verifier.verify_proof(params, pk.vk, {}, bytes(bad)), \
            f"flip at {pos} accepted"


def test_bad_witness_rejected(setup):
    circ, params, pk = setup
    w = toy.good_witness()
    w["b"][3] = toy.u64.from_int(999)  # violates the square gate
    proof = prover.create_proof(params, pk, w, {}, seed=5)
    assert not verifier.verify_proof(params, pk.vk, {}, proof)


def test_proof_deterministic_per_seed(setup):
    circ, params, pk = setup
    p1 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=6)
    p2 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=6)
    p3 = prover.create_proof(params, pk, toy.good_witness(), {}, seed=7)
    assert p1 == p2
    assert p1 != p3  # different blinding
    assert verifier.verify_proof(params, pk.vk, {}, p3)


def test_garbage_proofs_rejected_not_raised(setup):
    """Any malformed byte stream must return False, never raise (the
    reference's verifier returns Result; ours must be as total)."""
    circ, params, pk = setup
    import os as _os

    for blob in (b"", b"\x00" * 10, b"\xff" * 4480, _os.urandom(931),
                 _os.urandom(4480)):
        assert verifier.verify_proof(params, pk.vk, {}, blob) is False
