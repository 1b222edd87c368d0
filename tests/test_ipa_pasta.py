"""IPA backend on the Pasta "pallas" curve — the reference circuit
crate's actual L0 backend (pasta_curves; table16.rs:93-98, SURVEY.md §1).

Closes the round-2 documented divergence "IPA runs on BN254 not Pasta"
(VERDICT r2 missing #3 / next #9): Pasta G1 device ops against the host
oracle, and the full Pedersen-commit → log-size-open → verify cycle over
Pasta at toy size, including tamper rejection.
"""

import numpy as np
import pytest

from zkodst_tpu.ops import curve, pycurve
from zkodst_tpu.ops.pyfield import VESTA_BASE
from zkodst_tpu.proof import ipa
from zkodst_tpu.proof.transcript import Blake2bRead, Blake2bWrite

K = 3          # 8-coefficient polynomial — device graphs stay tiny
GEN = pycurve.PASTA_G1_GEN
G = pycurve.PASTA_G1


def test_pasta_device_ops_match_host_oracle():
    pts_i = [G.mul(GEN, 3 * i + 2) for i in range(4)]
    dev = curve.PASTA.from_affine_ints(pts_i)
    # add: P_i + P_{i+1}
    s = curve.PASTA.add(dev[:2], dev[2:])
    got = curve.PASTA.to_affine_ints(np.asarray(s))
    want = [G.add(pts_i[0], pts_i[2]), G.add(pts_i[1], pts_i[3])]
    assert got == want
    # double + identity handling
    d = curve.PASTA.double(dev)
    assert curve.PASTA.to_affine_ints(np.asarray(d)) == \
        [G.add(p, p) for p in pts_i]
    idp = curve.PASTA.identity((1,))
    assert curve.PASTA.to_affine_ints(
        np.asarray(curve.PASTA.add(idp, dev[:1])))[0] == pts_i[0]


@pytest.fixture(scope="module")
def params():
    return ipa.setup(K, curve_name="pasta")


def test_pasta_generators_on_curve(params):
    pts = curve.PASTA.to_affine_ints(params.g[:4])
    for p in pts:
        assert G.is_on_curve(p)
    assert G.is_on_curve(params.h) and G.is_on_curve(params.u)
    # distinct from the BN254 generator set (different hash domain + field)
    assert params.curve == "pasta"


def test_pasta_ipa_commit_open_verify(params):
    p = VESTA_BASE
    coeffs = [(7 * i + 3) % p for i in range(1 << K)]
    cm = ipa.PASTA_FR.from_ints(coeffs)
    blind = 12345
    com = ipa.commit(params, cm, blind)
    assert G.is_on_curve(com)
    x = 987654321
    v = 0
    for c in reversed(coeffs):
        v = (v * x + c) % p
    tw = Blake2bWrite(mode="pasta")
    ipa.open_poly(params, cm, blind, x, v, tw,
                  rng=__import__("random").Random(1))
    proof = tw.finalize()
    tr = Blake2bRead(proof, mode="pasta")
    assert ipa.verify_poly(params, com, x, v, tr, n=1 << K)
    # wrong value rejects
    tr2 = Blake2bRead(proof, mode="pasta")
    assert not ipa.verify_poly(params, com, x, (v + 1) % p, tr2,
                               n=1 << K)
    # tampered proof rejects (flip one byte; decode errors -> reject)
    bad = bytearray(proof)
    bad[1] ^= 1
    tr3 = Blake2bRead(bytes(bad), mode="pasta")
    try:
        ok = ipa.verify_poly(params, com, x, v, tr3, n=1 << K)
    except AssertionError:
        ok = False
    assert not ok
