"""BN254 pairing + transcript unit tests (host-side, no JAX)."""

import random

import pytest

from zkodst_tpu.ops import pycurve
from zkodst_tpu.ops.pyfield import FR
from zkodst_tpu.proof import pairing as pr
from zkodst_tpu.proof import transcript as tr

G1 = pycurve.G1_GEN
G2 = pycurve.G2_GEN
rng = random.Random(7)


def test_pairing_nondegenerate():
    e = pr.pairing(G2, G1)
    assert e != pr.F12_ONE
    assert pr.f12_pow(e, pycurve.R_ORDER) == pr.F12_ONE


def test_pairing_bilinear():
    a, b = rng.randrange(1, FR.p), rng.randrange(1, FR.p)
    e1 = pr.pairing(pycurve.G2.mul(G2, b), pycurve.G1.mul(G1, a))
    e2 = pr.f12_pow(pr.pairing(G2, G1), a * b % FR.p)
    assert e1 == e2


def test_pairing_check_product():
    # e(aG1, G2) · e(-G1, aG2) == 1
    a = rng.randrange(1, FR.p)
    pairs = [(pycurve.G1.mul(G1, a), G2),
             (pycurve.G1.neg(G1), pycurve.G2.mul(G2, a))]
    assert pr.pairing_check(pairs)
    pairs_bad = [(pycurve.G1.mul(G1, a + 1), G2),
                 (pycurve.G1.neg(G1), pycurve.G2.mul(G2, a))]
    assert not pr.pairing_check(pairs_bad)


def test_point_compression_roundtrip():
    for k in [0, 1, 2, 12345, FR.p - 1]:
        pt = pycurve.G1.mul(G1, k) if k else None
        assert tr.decompress_g1(tr.compress_g1(pt)) == pt


def test_transcript_write_read_parity():
    w = tr.Blake2bWrite()
    p1 = pycurve.G1.mul(G1, 42)
    w.common_scalar(5)
    w.write_point(p1)
    c1 = w.squeeze_challenge()
    w.write_scalar(123456789)
    c2 = w.squeeze_challenge()
    proof = w.finalize()

    r = tr.Blake2bRead(proof)
    r.common_scalar(5)
    assert r.read_point() == p1
    assert r.squeeze_challenge() == c1
    assert r.read_scalar() == 123456789
    assert r.squeeze_challenge() == c2
    assert r.done()
    assert c1 != c2 and 0 < c1 < FR.p


def test_transcript_tampered_point_changes_or_rejects():
    # a flipped x byte either fails decompression or decodes to a different
    # point (and in any case diverges the Fiat–Shamir challenges)
    orig = pycurve.G1.mul(G1, 9)
    w = tr.Blake2bWrite()
    w.write_point(orig)
    proof = bytearray(w.finalize())
    proof[0] ^= 1
    r = tr.Blake2bRead(bytes(proof))
    try:
        pt = r.read_point()
    except AssertionError:
        return
    assert pt != orig
