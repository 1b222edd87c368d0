import numpy as np
import jax
import pytest

from zkodst_tpu.ops import field, pyfield

rng = np.random.default_rng(7)

FIELDS = [field.FR, field.FQ]


def rand_elems(F, n):
    return [int.from_bytes(rng.bytes(40), "little") % F.p for _ in range(n)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_roundtrip(F):
    xs = rand_elems(F, 20) + [0, 1, F.p - 1, F.r % F.p]
    arr = F.from_ints(xs)
    assert list(F.to_ints(arr)) == [x % F.p for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F):
    a, b = rand_elems(F, 64), rand_elems(F, 64)
    A, B = F.from_ints(a), F.from_ints(b)
    assert list(F.to_ints(F.add(A, B))) == [(x + y) % F.p for x, y in zip(a, b)]
    assert list(F.to_ints(F.sub(A, B))) == [(x - y) % F.p for x, y in zip(a, b)]
    assert list(F.to_ints(F.neg(A))) == [(-x) % F.p for x in a]
    # edges
    E = F.from_ints([0, F.p - 1, 1])
    assert list(F.to_ints(F.add(E, E))) == [0, F.p - 2, 2]
    assert list(F.to_ints(F.sub(E, F.from_ints([1, 0, 2])))) == [
        F.p - 1, F.p - 1, F.p - 1]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul(F):
    a, b = rand_elems(F, 128), rand_elems(F, 128)
    a += [0, 1, F.p - 1, 2**255 % F.p]
    b += [F.p - 1, F.p - 1, F.p - 1, 2**255 % F.p]
    A, B = F.from_ints(a), F.from_ints(b)
    got = list(F.to_ints(jax.jit(F.mul)(A, B)))
    assert got == [x * y % F.p for x, y in zip(a, b)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul_associative_distributive(F):
    a, b, c = (F.from_ints(rand_elems(F, 32)) for _ in range(3))
    ab_c = F.mul(F.mul(a, b), c)
    a_bc = F.mul(a, F.mul(b, c))
    np.testing.assert_array_equal(np.asarray(ab_c), np.asarray(a_bc))
    lhs = F.mul(a, F.add(b, c))
    rhs = F.add(F.mul(a, b), F.mul(a, c))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_pow_and_inv():
    F = field.FR
    a = rand_elems(F, 16)
    A = F.from_ints(a)
    got = list(F.to_ints(F.pow_static(A, 12345)))
    assert got == [pow(x, 12345, F.p) for x in a]
    inv = jax.jit(F.inv)(A)
    assert list(F.to_ints(F.mul(A, inv))) == [1] * 16
    # zero maps to zero
    z = F.from_ints([0])
    assert list(F.to_ints(F.inv(z))) == [0]


def test_root_of_unity():
    pf = pyfield.FR
    w = pf.root_of_unity(28)
    assert pow(w, 1 << 28, pf.p) == 1
    assert pow(w, 1 << 27, pf.p) == pf.p - 1
    w8 = pf.root_of_unity(3)
    assert pow(w8, 8, pf.p) == 1 and pow(w8, 4, pf.p) != 1


def test_sqrt():
    pf = pyfield.FR
    for _ in range(5):
        x = int.from_bytes(rng.bytes(32), "little") % pf.p
        s = pf.sqrt(x * x % pf.p)
        assert s is not None and s * s % pf.p == x * x % pf.p


def test_mul_const_and_predicates():
    F = field.FR
    a = rand_elems(F, 8)
    A = F.from_ints(a)
    assert list(F.to_ints(F.mul_const(A, 3))) == [x * 3 % F.p for x in a]
    assert not bool(np.any(np.asarray(F.is_zero(A))))
    assert bool(np.all(np.asarray(F.eq(A, A))))


def test_inv_batch():
    import jax.numpy as jnp
    from zkodst_tpu.ops.field import FR

    rng = np.random.default_rng(9)
    vals = [int(x) | 1 for x in rng.integers(1, 1 << 62, 37)]  # nonzero
    a = jnp.asarray(FR.from_ints(vals))
    out = FR.to_ints(np.asarray(FR.inv_batch(a)))
    for v, o in zip(vals, out):
        assert int(o) == pow(v, -1, FR.py.p)


def test_pasta_pallas_base_generic():
    """The limb engine is modulus-generic: the reference circuit crate's
    default field (pallas::Base, table16.rs:93-98) works unchanged."""
    import jax.numpy as jnp
    from zkodst_tpu.ops.field import Field
    from zkodst_tpu.ops.pyfield import PALLAS_BASE, PF

    FP = Field(PALLAS_BASE, "pallas_base")
    py = PF(PALLAS_BASE)
    rng = np.random.default_rng(12)
    av = [int(x) for x in rng.integers(0, 1 << 62, 16)]
    bv = [int(x) for x in rng.integers(0, 1 << 62, 16)]
    a, b = jnp.asarray(FP.from_ints(av)), jnp.asarray(FP.from_ints(bv))
    got = FP.to_ints(np.asarray(jax.jit(FP.mul)(a, b)))
    for x, y, g in zip(av, bv, got):
        assert int(g) == py.mul(x, y)
    got = FP.to_ints(np.asarray(jax.jit(FP.sub)(a, b)))
    for x, y, g in zip(av, bv, got):
        assert int(g) == py.sub(x, y)


def test_pasta_ntt_roundtrip():
    import jax.numpy as jnp
    from zkodst_tpu.ops import ntt as nttmod
    from zkodst_tpu.ops.field import Field
    from zkodst_tpu.ops.pyfield import PALLAS_BASE, PF

    FP = Field(PALLAS_BASE, "pallas_base")
    py = PF(PALLAS_BASE)
    w = py.root_of_unity(4)
    rng = np.random.default_rng(13)
    vals = [int(x) for x in rng.integers(0, 1 << 62, 16)]
    a = jnp.asarray(FP.from_ints(vals))
    back = FP.to_ints(np.asarray(nttmod.intt(FP, nttmod.ntt(FP, a, w), w)))
    assert [int(x) for x in back] == vals
