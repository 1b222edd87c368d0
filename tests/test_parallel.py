"""Sharded NTT / MSM on the 8-virtual-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from zkodst_tpu.ops import curve, msm, ntt as nttmod, pycurve
from zkodst_tpu.ops.field import FR
from zkodst_tpu.ops.pyfield import FR as PFR
from zkodst_tpu.parallel import msm_sharded, ntt_sharded

K = 6
N = 1 << K


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:4])
    return Mesh(devs, axis_names=("x",))


def test_ntt_sharded_matches_single(mesh):
    rng = np.random.default_rng(5)
    vals = [int(x) for x in rng.integers(0, 1 << 62, N)]
    a = FR.from_ints(vals)
    w = PFR.root_of_unity(K)
    ref = np.asarray(nttmod.ntt(FR, a, w))
    out = ntt_sharded.ntt_sharded(FR, a, w, mesh, "x")
    nat = np.asarray(ntt_sharded.to_natural(out, n1=8))
    assert np.array_equal(nat, ref)


def test_intt_sharded_roundtrip(mesh):
    rng = np.random.default_rng(6)
    vals = [int(x) for x in rng.integers(0, 1 << 62, N)]
    a = FR.from_ints(vals)
    w = PFR.root_of_unity(K)
    c = ntt_sharded.ntt_sharded(FR, a, w, mesh, "x")
    back = np.asarray(ntt_sharded.intt_sharded(FR, c, w, mesh, "x"))
    assert np.array_equal(back, np.asarray(a))


def test_msm_sharded_matches_single(mesh):
    rng = np.random.default_rng(7)
    n = 16
    scal = [int(x) for x in rng.integers(1, 1 << 62, n)]
    pts_aff = [pycurve.G1.mul(pycurve.G1_GEN, i + 1) for i in range(n)]
    pts = curve.from_affine_ints(pts_aff)
    limbs = np.zeros((n, 16), np.uint32)
    for i, s in enumerate(scal):
        for j in range(4):
            limbs[i, j] = (s >> (16 * j)) & 0xFFFF
    single = curve.to_affine_ints(np.asarray(msm.msm(pts, limbs, 8))[None])[0]
    shard = msm_sharded.msm_sharded(pts, limbs, mesh, "x", c=8)
    assert curve.to_affine_ints(np.asarray(shard)[None])[0] == single
    expected = None
    for s, p in zip(scal, pts_aff):
        expected = pycurve.G1.add(expected, pycurve.G1.mul(p, s))
    assert single == expected
