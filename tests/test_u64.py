import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zkodst_tpu.ops import u64

rng = np.random.default_rng(0)


def rand_u64(n):
    return [int(x) for x in rng.integers(0, 1 << 64, size=n, dtype=np.uint64)]


def test_roundtrip():
    xs = rand_u64(100) + [0, 1, (1 << 64) - 1, 1 << 63]
    arr = u64.from_ints(xs)
    assert arr.shape == (len(xs), 2)
    back = u64.to_ints(arr)
    assert list(back) == xs


def test_add():
    a, b = rand_u64(200), rand_u64(200)
    got = u64.to_ints(u64.add(u64.from_ints(a), u64.from_ints(b)))
    want = [(x + y) & 0xFFFFFFFFFFFFFFFF for x, y in zip(a, b)]
    assert list(got) == want


def test_xor_and_not():
    a, b = rand_u64(100), rand_u64(100)
    A, B = u64.from_ints(a), u64.from_ints(b)
    assert list(u64.to_ints(u64.xor(A, B))) == [x ^ y for x, y in zip(a, b)]
    assert list(u64.to_ints(u64.and_(A, B))) == [x & y for x, y in zip(a, b)]
    assert list(u64.to_ints(u64.not_(A))) == [x ^ 0xFFFFFFFFFFFFFFFF for x in a]


@pytest.mark.parametrize("n", [0, 1, 8, 16, 24, 31, 32, 33, 48, 63])
def test_rotr_shifts(n):
    a = rand_u64(64)
    A = u64.from_ints(a)
    mask = 0xFFFFFFFFFFFFFFFF
    want_rot = [((x >> n) | (x << (64 - n))) & mask if n else x for x in a]
    assert list(u64.to_ints(u64.rotr(A, n))) == want_rot
    assert list(u64.to_ints(u64.shr(A, n))) == [x >> n for x in a]
    assert list(u64.to_ints(u64.shl(A, n))) == [(x << n) & mask for x in a]


def test_limbs16():
    a = rand_u64(64)
    A = u64.from_ints(a)
    limbs = u64.to_limbs16(A)
    want = np.array([[(x >> (16 * i)) & 0xFFFF for i in range(4)] for x in a],
                    dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(limbs), want)
    np.testing.assert_array_equal(np.asarray(u64.from_limbs16(limbs)),
                                  np.asarray(A))


def test_jit_compatible():
    a = u64.from_ints(rand_u64(16))
    f = jax.jit(lambda x: u64.rotr(u64.add(x, x), 7))
    np.testing.assert_array_equal(
        np.asarray(f(a)), np.asarray(u64.rotr(u64.add(a, a), 7)))
