"""Instance-column transcript binding, v1 vs halo2ce modes.

halo2-ce's KZG path (QUERY_INSTANCE = false) absorbs every provided
instance VALUE as a common scalar before the advice commitments — the
instances the reference's bench passes into `create_proof`
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:64-81) enter
Fiat–Shamir that way. ``halo2ce`` mode replicates that structure
(prover.absorb_instances); ``v1`` keeps the pinned one-digest absorb.
Both must be binding: a changed public input must un-verify the proof.
"""

import numpy as np
import pytest

import test_circuit_ir as toy
from zkodst_tpu.circuit.expr import V
from zkodst_tpu.circuit.ir import CircuitDef, CopyGroup, Gate, Lookup
from zkodst_tpu.ops import u64
from zkodst_tpu.proof import keygen, prover, srs, verifier


def pub_circuit():
    """The toy circuit + an instance column: pub[0] must equal b[1]."""
    sel = np.zeros((toy.N, 2), np.uint32)
    sel[:8, 0] = 1
    circ = CircuitDef(
        k=toy.K, advice_names=["a", "b"], instance_names=["pub"],
        fixed={"q": sel, "t": toy._u64col(range(16))},
        gates=[Gate("square", V("q") * (V("a") * V("a") - V("b")))],
        lookups=[Lookup("a_range", ["a"], ["t"])],
        copies=[CopyGroup("b", np.array([1]), "pub", np.array([0]))],
        instance_len={"pub": 2},
    )
    circ.validate()
    return circ


@pytest.fixture(scope="module")
def setup():
    circ = pub_circuit()
    params = srs.setup(circ.k, seed=2)
    pk = keygen.keygen(params, circ, msm_window=4)
    w = toy.good_witness()
    pub = np.zeros((toy.N, 2), np.uint32)
    pub[0] = w["b"][1]
    return circ, params, pk, w, {"pub": pub}


@pytest.mark.parametrize("mode", ["v1", "halo2ce"])
def test_prove_verify_roundtrip(setup, mode):
    circ, params, pk, w, inst = setup
    proof = prover.create_proof(params, pk, w, inst, seed=3,
                                transcript_mode=mode)
    assert verifier.verify_proof(params, pk.vk, inst, proof,
                                 transcript_mode=mode)


@pytest.mark.parametrize("mode", ["v1", "halo2ce"])
def test_changed_instance_rejected(setup, mode):
    circ, params, pk, w, inst = setup
    proof = prover.create_proof(params, pk, w, inst, seed=4,
                                transcript_mode=mode)
    bad = {"pub": inst["pub"].copy()}
    bad["pub"][0] = u64.from_int(12345)
    assert not verifier.verify_proof(params, pk.vk, bad, proof,
                                     transcript_mode=mode)


def test_zero_instance_value_still_absorbed(setup):
    """halo2ce absorbs the declared PREFIX per position — a zero public
    input at a live row must still bind (no nonzero-row skipping)."""
    circ, params, pk, w, inst = setup
    # row 1 of the prefix is zero in `inst`; a proof made with a NONZERO
    # row-1 value must not verify against the zero one
    inst2 = {"pub": inst["pub"].copy()}
    inst2["pub"][1] = u64.from_int(77)
    proof = prover.create_proof(params, pk, w, inst2, seed=5,
                                transcript_mode="halo2ce")
    assert verifier.verify_proof(params, pk.vk, inst2, proof,
                                 transcript_mode="halo2ce")
    assert not verifier.verify_proof(params, pk.vk, inst, proof,
                                     transcript_mode="halo2ce")


def test_modes_produce_different_bytes(setup):
    circ, params, pk, w, inst = setup
    p1 = prover.create_proof(params, pk, w, inst, seed=6,
                             transcript_mode="v1")
    p2 = prover.create_proof(params, pk, w, inst, seed=6,
                             transcript_mode="halo2ce")
    assert p1 != p2
    assert not verifier.verify_proof(params, pk.vk, inst, p2,
                                     transcript_mode="v1")


def test_halo2ce_rejects_unbound_suffix_rows(setup):
    """Soundness (ADVICE r4 high): rows past the declared instance_len
    prefix are NOT absorbed into the transcript in halo2ce mode, yet the
    verifier's evaluation covers every nonzero row of the supplied
    column. A forger claiming a false prefix could otherwise solve for
    one unabsorbed row value after challenges are fixed. Both sides must
    reject such columns outright."""
    circ, params, pk, w, inst = setup
    proof = prover.create_proof(params, pk, w, inst, seed=8,
                                transcript_mode="halo2ce")
    forged = {"pub": inst["pub"].copy()}
    forged["pub"][5] = u64.from_int(999)     # past the len-2 prefix
    # verifier: clean rejection, not a crash
    assert not verifier.verify_proof(params, pk.vk, forged, proof,
                                     transcript_mode="halo2ce")
    # prover: loud error (the caller's instance column is malformed)
    with pytest.raises(ValueError, match="unbound"):
        prover.create_proof(params, pk, w, forged, seed=8,
                            transcript_mode="halo2ce")


def test_halo2ce_requires_declared_length(setup):
    circ, params, pk, w, inst = setup
    circ2 = pub_circuit()
    circ2.instance_len = {}
    params2, pk2 = params, keygen.keygen(params, circ2, msm_window=4)
    with pytest.raises(AssertionError, match="instance_len"):
        prover.create_proof(params2, pk2, w, inst, seed=7,
                            transcript_mode="halo2ce")
