"""SRS + domain + SHPLONK multiopen tests at tiny k (CPU-fast)."""

import random

import numpy as np
import pytest

from zkodst_tpu.ops.field import FR as DFR
from zkodst_tpu.ops.pyfield import FR
from zkodst_tpu.proof import srs, shplonk
from zkodst_tpu.proof.domain import Domain
from zkodst_tpu.proof.transcript import Blake2bRead, Blake2bWrite

K = 3
rng = random.Random(11)


@pytest.fixture(scope="module")
def params():
    return srs.setup(K, seed=1)


@pytest.fixture(scope="module")
def dom():
    return Domain(K)


def _rand_poly(n):
    return [rng.randrange(FR.p) for _ in range(n)]


def _eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR.p
    return acc


def test_commit_bases_agree(params, dom):
    """Lagrange-basis commit of evals == monomial-basis commit of coeffs."""
    n = 1 << K
    coeffs = _rand_poly(n)
    evals = [_eval(coeffs, pow(dom.omega, j, FR.p)) for j in range(n)]
    c1 = srs.to_affine(srs.commit_coeff(params, DFR.from_ints(coeffs), c=4))
    c2 = srs.to_affine(srs.commit_lagrange(params, DFR.from_ints(evals), c=4))
    assert c1 == c2 and c1 is not None


def test_ntt_roundtrip_matches_host(dom):
    n = 1 << K
    coeffs = _rand_poly(n)
    evals_dev = dom.ntt(DFR.from_ints(coeffs))
    host = [_eval(coeffs, pow(dom.omega, j, FR.p)) for j in range(n)]
    assert list(DFR.to_ints(np.asarray(evals_dev))) == host
    back = dom.intt(evals_dev)
    assert list(DFR.to_ints(np.asarray(back))) == coeffs


def _make_claims(params, dom, x):
    n = 1 << K
    w = dom.omega
    polys = [_rand_poly(n) for _ in range(3)]
    point_sets = [(x,), (x, x * w % FR.p), (x, x * w % FR.p,
                                            x * pow(w, 5, FR.p) % FR.p)]
    claims_p, claims_v = [], []
    for coeffs, pts in zip(polys, point_sets):
        evals_h = [_eval(coeffs, s) for s in pts]
        evals_dev = dom.ntt(DFR.from_ints(coeffs))
        com = srs.to_affine(srs.commit_coeff(params, DFR.from_ints(coeffs),
                                             c=4))
        claims_p.append(shplonk.Claim(tuple(pts), tuple(evals_h),
                                      evals_dev=evals_dev))
        claims_v.append(shplonk.Claim(tuple(pts), tuple(evals_h),
                                      commitment=com))
    return claims_p, claims_v


def test_shplonk_roundtrip(params, dom):
    x = rng.randrange(1, FR.p)
    claims_p, claims_v = _make_claims(params, dom, x)
    tw = Blake2bWrite()
    shplonk.open_claims(params, dom, claims_p, tw)
    proof = tw.finalize()
    assert len(proof) == 64  # two G1 points

    tr = Blake2bRead(proof)
    assert shplonk.verify_claims(params, dom, claims_v, tr)


def test_shplonk_rejects_wrong_eval(params, dom):
    x = rng.randrange(1, FR.p)
    claims_p, claims_v = _make_claims(params, dom, x)
    tw = Blake2bWrite()
    shplonk.open_claims(params, dom, claims_p, tw)
    proof = tw.finalize()

    bad = [shplonk.Claim(c.points,
                         tuple((e + (1 if i == j == 0 else 0)) % FR.p
                               for j, e in enumerate(c.evals)),
                         commitment=c.commitment)
           for i, c in enumerate(claims_v)]
    tr = Blake2bRead(proof)
    assert not shplonk.verify_claims(params, dom, bad, tr)


def test_srs_save_load(params, tmp_path):
    path = str(tmp_path / "srs.npz")
    srs.save(params, path)
    p2 = srs.load(path)
    assert p2.k == params.k
    assert np.array_equal(p2.g1, params.g1)
    assert p2.s_g2 == params.s_g2
