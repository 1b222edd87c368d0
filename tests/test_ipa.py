"""IPA commitment scheme (proof/ipa.py) — the reference's second backend
(IPA params in /root/reference/blake2f-circuit/benches/blake2f.rs:83-151).

Commit/open/verify roundtrip, soundness negatives (wrong eval, tampered
proof bytes), hiding, and the per-point RLC multiopen."""

import random

import numpy as np
import pytest

from zkodst_tpu.ops.field import FR
from zkodst_tpu.ops.pyfield import FR as PFR
from zkodst_tpu.proof import ipa
from zkodst_tpu.proof.transcript import Blake2bRead, Blake2bWrite

K = 5
N = 1 << K
rng = random.Random(99)


@pytest.fixture(scope="module")
def params():
    return ipa.setup(K)


def _poly():
    coeffs = [rng.randrange(PFR.p) for _ in range(N)]
    return coeffs, np.asarray(FR.from_ints(coeffs))


def _eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % PFR.p
    return acc


def test_commit_open_verify_roundtrip(params):
    coeffs, dev = _poly()
    blind = rng.randrange(PFR.p)
    com = ipa.commit(params, dev, blind)
    x = rng.randrange(PFR.p)
    v = _eval(coeffs, x)
    tw = Blake2bWrite()
    ipa.open_poly(params, dev, blind, x, v, tw, rng=rng)
    proof = tw.finalize()
    assert len(proof) == K * 64 + 64          # 2 points/round + 2 scalars
    tr = Blake2bRead(proof)
    assert ipa.verify_poly(params, com, x, v, tr)


def test_wrong_eval_rejected(params):
    coeffs, dev = _poly()
    blind = rng.randrange(PFR.p)
    com = ipa.commit(params, dev, blind)
    x = rng.randrange(PFR.p)
    v = _eval(coeffs, x)
    tw = Blake2bWrite()
    ipa.open_poly(params, dev, blind, x, v, tw, rng=rng)
    proof = tw.finalize()
    assert not ipa.verify_poly(params, com, x, (v + 1) % PFR.p,
                               Blake2bRead(proof))


def test_tampered_proof_rejected(params):
    coeffs, dev = _poly()
    blind = rng.randrange(PFR.p)
    com = ipa.commit(params, dev, blind)
    x = rng.randrange(PFR.p)
    v = _eval(coeffs, x)
    tw = Blake2bWrite()
    ipa.open_poly(params, dev, blind, x, v, tw, rng=rng)
    proof = bytearray(tw.finalize())
    proof[-1] ^= 1                           # corrupt the blinding scalar
    try:
        ok = ipa.verify_poly(params, com, x, v, Blake2bRead(bytes(proof)))
    except AssertionError:
        ok = False                           # out-of-range decode
    assert not ok


def test_hiding_commitments_differ(params):
    _, dev = _poly()
    c1 = ipa.commit(params, dev, rng.randrange(PFR.p))
    c2 = ipa.commit(params, dev, rng.randrange(PFR.p))
    assert c1 != c2                          # same poly, fresh blinds


def test_multiopen_roundtrip(params):
    polys = [_poly() for _ in range(3)]
    blinds = [rng.randrange(PFR.p) for _ in range(3)]
    coms = [ipa.commit(params, dev, b)
            for (_, dev), b in zip(polys, blinds)]
    x1, x2 = rng.randrange(PFR.p), rng.randrange(PFR.p)
    claims_p, claims_v = [], []
    for (coeffs, dev), b, com in zip(polys, blinds, coms):
        for x in (x1, x2):
            claims_p.append(ipa.IPAClaim(point=x, value=_eval(coeffs, x),
                                         coeffs_mont=dev, blind=b))
            claims_v.append(ipa.IPAClaim(point=x, value=_eval(coeffs, x),
                                         commitment=com))
    tw = Blake2bWrite()
    for com in coms:
        tw.common_point(com)
    ipa.open_claims(params, claims_p, tw, rng=rng)
    proof = tw.finalize()
    tr = Blake2bRead(proof)
    for com in coms:
        tr.common_point(com)
    assert ipa.verify_claims(params, claims_v, tr, n=N)

    bad = [ipa.IPAClaim(point=c.point, value=c.value, commitment=c.commitment)
           for c in claims_v]
    bad[2].value = (bad[2].value + 1) % PFR.p
    tr = Blake2bRead(proof)
    for com in coms:
        tr.common_point(com)
    assert not ipa.verify_claims(params, bad, tr, n=N)


def test_setup_cache_roundtrip(tmp_path, params):
    p2 = ipa.setup(K, cache_dir=str(tmp_path))
    p3 = ipa.setup(K, cache_dir=str(tmp_path))
    assert np.array_equal(p2.g, p3.g) and p2.h == p3.h and p2.u == p3.u
    assert np.array_equal(p2.g, params.g)
