"""halo2ce transcript-compatibility mode (docs/FORMAT.md §compat).

The reference pins `Blake2bWrite/Blake2bRead + Challenge255<G1Affine>` and
halo2curves point serialization (/root/reference/benchmarking/src/
blake2f_circuit_bench.rs:56-101). The compat mode implements the encoding
divergences FORMAT.md documents; byte parity against a live halo2-ce
binary is untestable here (no Rust toolchain), so these tests pin the
mode's OWN behavior: both modes prove+verify, their bytes differ exactly
where documented, and the halo2curves point layout round-trips.
"""

import pytest

import test_circuit_ir as toy
from zkodst_tpu.ops import pycurve
from zkodst_tpu.proof import keygen, prover, srs, verifier
from zkodst_tpu.proof.transcript import (
    Blake2bRead, Blake2bWrite, compress_g1, compress_g1_halo2ce,
    decompress_g1_halo2ce)


def test_halo2ce_point_layout_roundtrip():
    pt = pycurve.G1_GEN
    for i in range(1, 8):
        q = pycurve.G1.mul(pt, i * 7 + 1)
        enc = compress_g1_halo2ce(q)
        assert len(enc) == 32
        assert enc[31] & 0x80 == 0          # bit 255 clear (halo2curves)
        assert decompress_g1_halo2ce(enc) == q
    assert compress_g1_halo2ce(None) == bytes(32)
    assert decompress_g1_halo2ce(bytes(32)) is None


def test_halo2ce_sign_bit_position_differs_from_v1():
    # find a point with odd y so the sign bit is set in both encodings
    q = None
    for i in range(1, 20):
        cand = pycurve.G1.mul(pycurve.G1_GEN, i)
        if cand[1] & 1:
            q = cand
            break
    assert q is not None
    v1, ce = compress_g1(q), compress_g1_halo2ce(q)
    assert v1[:31] == ce[:31]
    assert v1[31] & 0x80 and not v1[31] & 0x40      # v1: bit 7
    assert ce[31] & 0x40 and not ce[31] & 0x80      # halo2ce: bit 6


def test_absorption_rules_differ():
    """v1 absorbs the compressed point; halo2ce absorbs full coords —
    the first challenge after one point absorb must differ."""
    q = pycurve.G1.mul(pycurve.G1_GEN, 12345)
    a, b = Blake2bWrite(mode="v1"), Blake2bWrite(mode="halo2ce")
    a.common_point(q)
    b.common_point(q)
    assert a.squeeze_challenge() != b.squeeze_challenge()
    # scalar absorption is shared: identical transcripts -> same challenge
    a2, b2 = Blake2bWrite(mode="v1"), Blake2bWrite(mode="halo2ce")
    a2.common_scalar(42)
    b2.common_scalar(42)
    assert a2.squeeze_challenge() == b2.squeeze_challenge()


@pytest.fixture(scope="module")
def setup():
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=2)
    pk = keygen.keygen(params, circ, msm_window=4)
    return circ, params, pk


def test_both_modes_prove_and_verify(setup):
    circ, params, pk = setup
    wit = toy.good_witness()
    p_v1 = prover.create_proof(params, pk, wit, {}, seed=7)
    p_ce = prover.create_proof(params, pk, wit, {}, seed=7,
                               transcript_mode="halo2ce")
    assert verifier.verify_proof(params, pk.vk, {}, p_v1)
    assert verifier.verify_proof(params, pk.vk, {}, p_ce,
                                 transcript_mode="halo2ce")
    # the two wire formats are genuinely different streams...
    assert p_v1 != p_ce
    assert len(p_v1) == len(p_ce)
    # ...and neither verifies under the other's rules
    assert not verifier.verify_proof(params, pk.vk, {}, p_ce)
    assert not verifier.verify_proof(params, pk.vk, {}, p_v1,
                                     transcript_mode="halo2ce")


def test_halo2ce_vk_binding_is_single_scalar(setup):
    _, _, pk = setup
    tw = Blake2bWrite(mode="halo2ce")
    pk.vk.hash_into(tw)
    tw2 = Blake2bWrite(mode="halo2ce")
    tw2.common_scalar(pk.vk.transcript_repr())
    assert tw.squeeze_challenge() == tw2.squeeze_challenge()


def test_read_transcript_replays_halo2ce(setup):
    circ, params, pk = setup
    wit = toy.good_witness()
    proof = prover.create_proof(params, pk, wit, {}, seed=9,
                                transcript_mode="halo2ce")
    tr = Blake2bRead(proof, mode="halo2ce")
    pt = tr.read_point()
    assert pt is None or pycurve.G1.is_on_curve(pt)
