"""64-bit unsigned integer ops on TPU, as pairs of uint32 lanes.

TPUs have no native 64-bit integer datapath; JAX's x64 mode emulates i64 with
poor throughput. We instead represent a u64 word as a uint32 array whose
trailing axis has size 2: ``w[..., 0]`` = low 32 bits, ``w[..., 1]`` = high 32
bits. Every op is elementwise over the leading axes, so witness generation for
thousands of BLAKE2f instances vectorizes for free (one `jax.vmap`/reshape).

This plays the role of the reference's native u64 arithmetic inside its
witness generator (see /root/reference/blake2f-circuit/src/blake2f/table16/
util.rs and compression_util.rs), redesigned for 32-bit vector lanes.

All shift/rotate amounts are static Python ints: under `jit` they select the
op pattern at trace time (no dynamic shifts on the hot path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
_MASK32 = np.uint32(0xFFFFFFFF)


def from_int(x: int, dtype=np.uint32) -> np.ndarray:
    """Python int (< 2^64) -> u64 pair [lo, hi]."""
    x = int(x) & 0xFFFFFFFFFFFFFFFF
    return np.array([x & 0xFFFFFFFF, x >> 32], dtype=dtype)


def from_ints(xs) -> np.ndarray:
    """Sequence of Python ints -> (..., 2) uint32 array."""
    arr = np.asarray(xs, dtype=object)
    shape = arr.shape
    flat = [int(x) & 0xFFFFFFFFFFFFFFFF for x in arr.ravel()]
    lo = np.array([x & 0xFFFFFFFF for x in flat], dtype=np.uint32)
    hi = np.array([x >> 32 for x in flat], dtype=np.uint32)
    return np.stack([lo, hi], axis=-1).reshape(shape + (2,))


def to_int(w) -> int:
    """u64 pair -> Python int (host-side, for tests)."""
    w = np.asarray(w, dtype=np.uint64)
    return int(w[..., 0]) | (int(w[..., 1]) << 32)


def to_ints(w) -> np.ndarray:
    """(..., 2) uint32 array -> (...,) object array of Python ints."""
    w = np.asarray(w)
    lo = w[..., 0].astype(object)
    hi = w[..., 1].astype(object)
    return lo + (hi * (1 << 32))


def xor(a, b):
    return jnp.bitwise_xor(a, b)


def and_(a, b):
    return jnp.bitwise_and(a, b)


def not_(a):
    return jnp.bitwise_not(a)


def add(a, b):
    """(a + b) mod 2^64, elementwise on u64 pairs."""
    lo = a[..., 0] + b[..., 0]
    carry = (lo < a[..., 0]).astype(U32)
    hi = a[..., 1] + b[..., 1] + carry
    return jnp.stack([lo, hi], axis=-1)


def rotr(a, n: int):
    """Rotate right by a static amount n in [0, 64)."""
    n = int(n) % 64
    lo, hi = a[..., 0], a[..., 1]
    if n == 0:
        return a
    if n == 32:
        return jnp.stack([hi, lo], axis=-1)
    if n > 32:
        lo, hi = hi, lo
        n -= 32
    # 0 < n < 32: out_lo = lo>>n | hi<<(32-n); out_hi = hi>>n | lo<<(32-n)
    out_lo = (lo >> np.uint32(n)) | (hi << np.uint32(32 - n))
    out_hi = (hi >> np.uint32(n)) | (lo << np.uint32(32 - n))
    return jnp.stack([out_lo, out_hi], axis=-1)


def shr(a, n: int):
    """Logical right shift by static n in [0, 64)."""
    n = int(n) % 64
    lo, hi = a[..., 0], a[..., 1]
    if n == 0:
        return a
    if n == 32:
        return jnp.stack([hi, jnp.zeros_like(hi)], axis=-1)
    if n > 32:
        return jnp.stack([hi >> np.uint32(n - 32), jnp.zeros_like(hi)], axis=-1)
    out_lo = (lo >> np.uint32(n)) | (hi << np.uint32(32 - n))
    out_hi = hi >> np.uint32(n)
    return jnp.stack([out_lo, out_hi], axis=-1)


def shl(a, n: int):
    """Left shift (mod 2^64) by static n in [0, 64)."""
    n = int(n) % 64
    lo, hi = a[..., 0], a[..., 1]
    if n == 0:
        return a
    if n == 32:
        return jnp.stack([jnp.zeros_like(lo), lo], axis=-1)
    if n > 32:
        return jnp.stack([jnp.zeros_like(lo), lo << np.uint32(n - 32)], axis=-1)
    out_lo = lo << np.uint32(n)
    out_hi = (hi << np.uint32(n)) | (lo >> np.uint32(32 - n))
    return jnp.stack([out_lo, out_hi], axis=-1)


def to_limbs16(a):
    """u64 pair (..., 2) -> four 16-bit little-endian limbs (..., 4) as uint32.

    This is the dense-limb view the circuit uses (the reference's 4x16
    decomposition, compression.rs:81-132)."""
    lo, hi = a[..., 0], a[..., 1]
    m = np.uint32(0xFFFF)
    return jnp.stack([lo & m, lo >> np.uint32(16), hi & m, hi >> np.uint32(16)],
                     axis=-1)


def from_limbs16(limbs):
    """Four 16-bit limbs (..., 4) -> u64 pair (..., 2)."""
    limbs = limbs.astype(U32)
    lo = limbs[..., 0] | (limbs[..., 1] << np.uint32(16))
    hi = limbs[..., 2] | (limbs[..., 3] << np.uint32(16))
    return jnp.stack([lo, hi], axis=-1)


def from_le_bytes(b):
    """(..., 8) uint8 little-endian bytes -> u64 pair."""
    b = b.astype(U32)
    lo = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    hi = b[..., 4] | (b[..., 5] << 8) | (b[..., 6] << 16) | (b[..., 7] << 24)
    return jnp.stack([lo, hi], axis=-1)
