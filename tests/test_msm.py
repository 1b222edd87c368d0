import numpy as np
import jax

from zkodst_tpu.ops import curve, msm, pycurve, field

rng = np.random.default_rng(13)
G = pycurve.G1
GEN = pycurve.G1_GEN


def setup(n, scalar_bits=254):
    base_ks = [int.from_bytes(rng.bytes(32), "little") % pycurve.R_ORDER
               for _ in range(n)]
    pts = [G.mul(GEN, k) for k in base_ks]
    scalars = [int.from_bytes(rng.bytes(32), "little") % (1 << scalar_bits)
               % pycurve.R_ORDER for _ in range(n)]
    P = curve.from_affine_ints(pts)
    S = np.stack([field.int_to_limbs(s) for s in scalars])
    want = None
    for p, s in zip(pts, scalars):
        want = G.add(want, G.mul(p, s))
    return P, S, want


def test_msm_matches_naive():
    P, S, want = setup(17)
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got == want


def test_msm_window4():
    P, S, want = setup(17)
    got = curve.to_affine_ints(msm.msm(P, S, c=4)[None])[0]
    assert got == want


def test_msm_edge_scalars():
    # zeros, ones, r-1, equal points (padded to 17 to share the compiled
    # (N=17, c=8) program across tests)
    pts = [GEN, GEN, G.mul(GEN, 5), G.mul(GEN, 7)] + [GEN] * 13
    scalars = [0, 1, pycurve.R_ORDER - 1, 0] + [3] * 13
    P = curve.from_affine_ints(pts)
    S = np.stack([field.int_to_limbs(s) for s in scalars])
    want = None
    for p, s in zip(pts, scalars):
        want = G.add(want, G.mul(p, s))
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got == want


def test_msm_all_zero():
    P, S, _ = setup(17)
    S = np.zeros_like(S)
    got = curve.to_affine_ints(msm.msm(P, S, c=8)[None])[0]
    assert got is None


def test_msm_mont_scalars():
    P, S, want = setup(17)
    ints = [field.limbs_to_int(s) for s in S]
    S_mont = field.FR.from_ints(ints)
    got = curve.to_affine_ints(msm.msm_mont(P, S_mont, c=8)[None])[0]
    assert got == want
