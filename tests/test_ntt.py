import numpy as np
import jax

from zkodst_tpu.ops import field, ntt, pyfield

F = field.FR
PF = pyfield.FR
rng = np.random.default_rng(5)


def rand_poly(n):
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(n)]


def naive_eval(coeffs, w):
    n = len(coeffs)
    return [sum(c * pow(w, i * j, F.p) for j, c in enumerate(coeffs)) % F.p
            for i in range(n)]


def test_ntt_matches_naive():
    n = 16
    w = PF.root_of_unity(4)
    coeffs = rand_poly(n)
    got = list(F.to_ints(ntt.ntt(F, F.from_ints(coeffs), w)))
    assert got == naive_eval(coeffs, w)


def test_intt_roundtrip():
    n = 256
    w = PF.root_of_unity(8)
    coeffs = rand_poly(n)
    a = F.from_ints(coeffs)
    back = ntt.intt(F, ntt.ntt(F, a, w), w)
    assert list(F.to_ints(back)) == coeffs


def test_batched_and_jit():
    n, B = 64, 3
    w = PF.root_of_unity(6)
    polys = [rand_poly(n) for _ in range(B)]
    a = np.stack([F.from_ints(p) for p in polys])
    out = jax.jit(lambda x: ntt.ntt(F, x, w))(a)
    for b in range(B):
        assert list(F.to_ints(out[b])) == naive_eval(polys[b], w)


def test_polynomial_multiplication():
    """NTT-based product == schoolbook product (the quotient-path workload)."""
    n = 32
    w = PF.root_of_unity(6)  # 2n-sized domain
    p1, p2 = rand_poly(n // 2), rand_poly(n // 2)
    a = F.from_ints(p1 + [0] * (2 * n - n // 2))
    b = F.from_ints(p2 + [0] * (2 * n - n // 2))
    ea = ntt.ntt(F, a, w)
    eb = ntt.ntt(F, b, w)
    prod = ntt.intt(F, F.mul(ea, eb), w)
    got = list(F.to_ints(prod))
    want = [0] * (2 * n)
    for i, x in enumerate(p1):
        for j, y in enumerate(p2):
            want[i + j] = (want[i + j] + x * y) % F.p
    assert got == want


def test_coset_ntt():
    n = 64
    w = PF.root_of_unity(6)
    g = PF.smallest_qnr()
    coeffs = rand_poly(n)
    a = F.from_ints(coeffs)
    evals = ntt.coset_ntt(F, a, w, g)
    # a(g * w^i)
    want = [sum(c * pow(g * pow(w, i, F.p) % F.p, j, F.p) for j, c in
                enumerate(coeffs)) % F.p for i in range(n)]
    assert list(F.to_ints(evals)) == want
    back = ntt.coset_intt(F, evals, w, g)
    assert list(F.to_ints(back)) == coeffs
