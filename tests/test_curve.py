import numpy as np
import jax

from zkodst_tpu.ops import curve, pycurve, field

rng = np.random.default_rng(11)
G = pycurve.G1
GEN = pycurve.G1_GEN


def rand_points(n):
    ks = [int.from_bytes(rng.bytes(32), "little") % pycurve.R_ORDER
          for _ in range(n)]
    return [G.mul(GEN, k) for k in ks], ks


def test_add_matches_reference():
    pts1, _ = rand_points(16)
    pts2, _ = rand_points(16)
    P = curve.from_affine_ints(pts1)
    Q = curve.from_affine_ints(pts2)
    got = curve.to_affine_ints(curve.add(P, Q))
    want = [G.add(a, b) for a, b in zip(pts1, pts2)]
    assert got == want


def test_complete_edge_cases():
    pts, _ = rand_points(4)
    P = curve.from_affine_ints(pts)
    O = np.asarray(np.broadcast_to(curve.identity(), P.shape))
    # P + O = P
    assert curve.to_affine_ints(curve.add(P, O)) == pts
    # O + P = P
    assert curve.to_affine_ints(curve.add(O, P)) == pts
    # O + O = O
    assert curve.to_affine_ints(curve.add(O, O)) == [None] * 4
    # P + (-P) = O
    assert curve.to_affine_ints(curve.add(P, curve.neg(P))) == [None] * 4
    # P + P = 2P  (completeness under doubling input)
    want = [G.add(p, p) for p in pts]
    assert curve.to_affine_ints(curve.add(P, P)) == want
    assert curve.to_affine_ints(curve.double(P)) == want
    # double(O) = O
    assert curve.to_affine_ints(curve.double(O)) == [None] * 4


def test_scalar_mul():
    pts, _ = rand_points(3)
    P = curve.from_affine_ints(pts)
    ks = [0, 1, int.from_bytes(rng.bytes(32), "little") % pycurve.R_ORDER]
    k_limbs = np.stack([field.int_to_limbs(k) for k in ks])
    got = curve.to_affine_ints(jax.jit(curve.scalar_mul)(P, k_limbs))
    want = [G.mul(p, k) if k else None for p, k in zip(pts, ks)]
    assert got == want


def test_scalar_mul_static():
    pts, _ = rand_points(2)
    P = curve.from_affine_ints(pts)
    got = curve.to_affine_ints(curve.scalar_mul_static(P, 12345))
    want = [G.mul(p, 12345) for p in pts]
    assert got == want


def test_group_law_properties():
    pts, _ = rand_points(8)
    P = curve.from_affine_ints(pts)
    # commutativity and associativity through a shifted copy
    Q = np.roll(P, 1, axis=0)
    R = np.roll(P, 3, axis=0)
    pq = curve.add(P, Q)
    qp = curve.add(Q, P)
    assert bool(np.all(np.asarray(curve.eq_points(pq, qp))))
    lhs = curve.add(curve.add(P, Q), R)
    rhs = curve.add(P, curve.add(Q, R))
    assert bool(np.all(np.asarray(curve.eq_points(lhs, rhs))))
