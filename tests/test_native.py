"""Native C++ crypto core (native/zkcore.cpp) vs the Python oracles."""

import random

import pytest

from zkodst_tpu import native
from zkodst_tpu.ops import pycurve
from zkodst_tpu.proof import pairing as ppy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native core unavailable (no g++?)")

G1, G2 = pycurve.G1_GEN, pycurve.G2_GEN
rng = random.Random(17)


def test_pairing_check_agrees_with_python():
    a = rng.randrange(1, pycurve.R_ORDER)
    good = [(pycurve.G1.mul(G1, a), G2),
            (pycurve.G1.neg(G1), pycurve.G2.mul(G2, a))]
    bad = [(pycurve.G1.mul(G1, a + 1), G2),
           (pycurve.G1.neg(G1), pycurve.G2.mul(G2, a))]
    assert native.pairing_check(good) == ppy.pairing_check(good) is True
    assert native.pairing_check(bad) == ppy.pairing_check(bad) is False


def test_pairing_with_identity_points():
    pairs = [(None, G2), (G1, None)]
    assert native.pairing_check(pairs)  # empty product == 1


def test_msm_matches_oracle():
    pts = [pycurve.G1.mul(G1, rng.randrange(1, 1000)) for _ in range(7)]
    pts.append(None)
    ks = [rng.randrange(pycurve.R_ORDER) for _ in range(8)]
    expected = None
    for p, k in zip(pts, ks):
        expected = pycurve.G1.add(expected, pycurve.G1.mul(p, k))
    assert native.g1_msm(pts, ks) == expected


def test_msm_zero_scalars():
    pts = [G1, pycurve.G1.mul(G1, 5)]
    assert native.g1_msm(pts, [0, 0]) is None
