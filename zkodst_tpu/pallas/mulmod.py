"""Pallas TPU kernel: fused 256-bit Montgomery multiplication.

The speed-of-light path for the prover's hot field ops (SURVEY.md §7
step 6). The jnp implementation (ops/field.py `Field.mul`) materializes the
(…,16,16) partial-product tensor and runs the 16-step Montgomery reduction
as a `lax.scan` — every step round-trips HBM (~26 KB moved per lane). This
kernel keeps one lane-tile of both operands in VMEM and does the whole
schoolbook + CIOS-style reduction + carry fix-up in registers: traffic
drops to the 128 B/lane of inputs+outputs, ~200× less.

Layout: limb-major (16, N) uint32 — limbs on sublanes, lanes on the
128-wide vector axis. `mulmod()` wraps the transposes; `Field`-compatible
entry `mul_limbs_pallas(F, a, b)` takes/returns the (…, 16) layout.

All limb loops are unrolled at trace time (static 16); every intermediate
is < 2^32 by the same value-range argument as ops/field.py (operands are
16-bit limbs; redundant columns stay < 2^22), with uint32 wrap-around used
only for the m = t·(-p⁻¹) mod 2^16 step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import Field

L = 16
MASK = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# register-level field primitives: values are 16-limb LISTS of (T,) uint32
# vectors, shared by every kernel in this package
# ---------------------------------------------------------------------------

def _vec_cond_sub_p(r, pv, zero):
    """r - p if r >= p else r (r normalized 16-bit limbs)."""
    d = []
    borrow = zero
    for k in range(L):
        v = r[k] - pv[k] - borrow              # uint32 wrap when negative
        d.append(v & MASK)
        borrow = v >> np.uint32(31)
    ge = borrow == 0
    return [jnp.where(ge, d[k], r[k]) for k in range(L)]


def _vec_add(a, b, pv, zero):
    """(a + b) mod p: ripple carry + conditional subtract."""
    r = []
    carry = zero
    for k in range(L):
        v = a[k] + b[k] + carry
        r.append(v & MASK)
        carry = v >> np.uint32(16)
    # a+b < 2p < 2^256: carry-out is 0
    return _vec_cond_sub_p(r, pv, zero)


def _vec_sub(a, b, pv, zero):
    """(a - b) mod p: ripple borrow; add p back on underflow."""
    d = []
    borrow = zero
    for k in range(L):
        v = a[k] - b[k] - borrow
        d.append(v & MASK)
        borrow = v >> np.uint32(31)
    under = borrow != 0
    r = []
    carry = zero
    for k in range(L):
        v = d[k] + jnp.where(under, pv[k], zero) + carry
        r.append(v & MASK)
        carry = v >> np.uint32(16)
    return r


def _vec_mul(a, b, pv, pinv16, zero):
    """Montgomery product (CIOS over 16-bit limb columns)."""
    t = [zero] * (2 * L + 1)
    for i in range(L):
        for j in range(L):
            pp = a[i] * b[j]                   # exact: operands < 2^16
            t[i + j] = t[i + j] + (pp & MASK)
            t[i + j + 1] = t[i + j + 1] + (pp >> np.uint32(16))
    for s in range(L):
        carry = t[s] >> np.uint32(16)
        ts = t[s] & MASK
        m = (ts * pinv16) & MASK               # uint32 wrap is fine here
        mp0 = m * pv[0]
        carry = carry + ((ts + (mp0 & MASK)) >> np.uint32(16))
        carry = carry + (mp0 >> np.uint32(16))
        t[s + 1] = t[s + 1] + carry
        for j in range(1, L):
            mp = m * pv[j]
            t[s + j] = t[s + j] + (mp & MASK)
            t[s + j + 1] = t[s + j + 1] + (mp >> np.uint32(16))
    r = []
    carry = zero
    for k in range(L, 2 * L):
        v = t[k] + carry
        r.append(v & MASK)
        carry = v >> np.uint32(16)
    return _vec_cond_sub_p(r, pv, zero)


def _mulmod_kernel(p_limbs, pinv16, a_ref, b_ref, o_ref):
    """One lane-tile: a_ref/b_ref/o_ref are (16, T) uint32 in VMEM."""
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    zero = jnp.zeros_like(a[0])
    pv = [np.uint32(x) for x in p_limbs]
    out = _vec_mul(a, b, pv, pinv16, zero)
    for k in range(L):
        o_ref[k, :] = out[k]


def _addmod_kernel(p_limbs, a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    zero = jnp.zeros_like(a[0])
    pv = [np.uint32(x) for x in p_limbs]
    out = _vec_add(a, b, pv, zero)
    for k in range(L):
        o_ref[k, :] = out[k]


def _submod_kernel(p_limbs, a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    zero = jnp.zeros_like(a[0])
    pv = [np.uint32(x) for x in p_limbs]
    out = _vec_sub(a, b, pv, zero)
    for k in range(L):
        o_ref[k, :] = out[k]


def _mul_chain_kernel(p_limbs, pinv16, x_ref, o_ref, acc_ref):
    """Sequential chained cumulative-product step (grid axis = position).

    Lane l of every (16, W) block belongs to chain l; grid step s
    presents chain l's s-th element:  out = acc·x ; acc := out  (acc
    starts at Montgomery 1). ONE field mul per element — the
    Hillis–Steele cumprod this replaces does log2(n) full-array muls
    plus two layout transposes per level (the (…,16)-minor wrapper),
    which round-5 profiling put at ~1.5 s of the prove's grand-product
    phase."""
    from jax.experimental import pallas as pl

    s = pl.program_id(0)
    pv = [np.uint32(v) for v in p_limbs]
    onev = [np.uint32(x) for x in p_limbs_one(pv, pinv16)]

    @pl.when(s == 0)
    def _init():
        for i in range(L):
            acc_ref[i, :] = jnp.zeros_like(x_ref[i, :]) + onev[i]

    zero = jnp.zeros_like(x_ref[0, :])
    acc = [acc_ref[i, :] for i in range(L)]
    x = [x_ref[i, :] for i in range(L)]
    out = _vec_mul(acc, x, pv, pinv16, zero)
    for i in range(L):
        o_ref[i, :] = out[i]
        acc_ref[i, :] = out[i]


_ONE_CACHE: dict = {}


def p_limbs_one(pv, pinv16):
    """Montgomery ONE (R mod p) limbs for the modulus with limb vector
    pv — cached per modulus (static, host-side)."""
    key = tuple(int(v) for v in pv)
    if key not in _ONE_CACHE:
        p = sum(int(v) << (16 * i) for i, v in enumerate(pv))
        r = (1 << 256) % p
        _ONE_CACHE[key] = tuple((r >> (16 * i)) & 0xFFFF for i in range(L))
    return _ONE_CACHE[key]


def _mul_scan_tile_kernel(p_limbs, pinv16, x_ref, o_ref):
    """All-levels Hillis–Steele cumulative product on ONE (16, T) VMEM
    tile (the aggregate pass of the two-level chained cumprod)."""
    from jax.experimental.pallas import tpu as pltpu

    T = x_ref.shape[1]
    zero = jnp.zeros((T,), jnp.uint32)
    pv = [np.uint32(v) for v in p_limbs]
    onev = [np.uint32(x) for x in p_limbs_one(pv, pinv16)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    x2d = x_ref[:, :]
    steps = max(1, (T - 1).bit_length())
    for it in range(steps):
        s = 1 << it
        rolled = pltpu.roll(x2d, s, axis=1)
        oob = lane < s
        prev = [jnp.where(oob.reshape(-1), onev[i], rolled[i, :])
                for i in range(L)]
        x = [x2d[i, :] for i in range(L)]
        out = _vec_mul(x, prev, pv, pinv16, zero)
        x2d = jnp.concatenate([r.reshape(1, -1) for r in out], axis=0)
    o_ref[:, :] = x2d


@partial(jax.jit, static_argnums=(0, 2))
def chain_cumprod_t(F: Field, xt, W: int):
    """Per-chain inclusive cumulative product of chain-major (16, n)
    Montgomery tensors (chain l at lanes l, W+l, 2W+l, …); returns the
    (16, n) local products (chain aggregates at the last block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = xt.shape[1]
    assert n % W == 0
    S = n // W
    return pl.pallas_call(
        partial(_mul_chain_kernel, tuple(int(x) for x in F.P),
                np.uint32(F.pinv16)),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(S,),
        in_specs=[pl.BlockSpec((L, W), lambda i: (0, i))],
        out_specs=pl.BlockSpec((L, W), lambda i: (0, i)),
        scratch_shapes=[pltpu.VMEM((L, W), jnp.uint32)],
    )(xt)


@partial(jax.jit, static_argnums=(0,))
def cumprod_tile_t(F: Field, xt):
    """Full inclusive cumulative product over the lanes of ONE (16, n)
    tile (n ≤ 2048), all levels fused in VMEM."""
    from jax.experimental import pallas as pl

    n = xt.shape[1]
    return pl.pallas_call(
        partial(_mul_scan_tile_kernel, tuple(int(x) for x in F.P),
                np.uint32(F.pinv16)),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(1,),
        in_specs=[pl.BlockSpec((L, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((L, n), lambda i: (0, 0)),
    )(xt)


def _binop_t(kern_builder, F: Field, at, bt):
    from jax.experimental import pallas as pl

    n = at.shape[1]
    tile = min(n, 2048)
    assert n % tile == 0, (n, tile)
    return pl.pallas_call(
        kern_builder(F),
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((L, tile), lambda i: (0, i)),
                  pl.BlockSpec((L, tile), lambda i: (0, i))],
        out_specs=pl.BlockSpec((L, tile), lambda i: (0, i)),
    )(at, bt)


@partial(jax.jit, static_argnums=(0,))
def mulmod_t(F: Field, at, bt):
    """Montgomery product on limb-major (16, N) uint32 tensors."""
    return _binop_t(
        lambda F: partial(_mulmod_kernel, tuple(int(x) for x in F.P),
                          np.uint32(F.pinv16)), F, at, bt)


@partial(jax.jit, static_argnums=(0,))
def addmod_t(F: Field, at, bt):
    return _binop_t(
        lambda F: partial(_addmod_kernel, tuple(int(x) for x in F.P)),
        F, at, bt)


@partial(jax.jit, static_argnums=(0,))
def submod_t(F: Field, at, bt):
    return _binop_t(
        lambda F: partial(_submod_kernel, tuple(int(x) for x in F.P)),
        F, at, bt)


def _apply_binop(op_t, F: Field, a, b):
    """Shared (…,16) wrapper: flatten lanes, pad to the tile multiple."""
    shape = a.shape
    a2 = a.reshape(-1, L)
    b2 = jnp.broadcast_to(b, shape).reshape(-1, L)
    n = a2.shape[0]
    tile = 2048 if n >= 2048 else max(128, 1 << (n - 1).bit_length())
    pad = (-n) % tile
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, L), jnp.uint32)])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, L), jnp.uint32)])
    out = op_t(F, a2.T, b2.T).T
    if pad:
        out = out[:n]
    return out.reshape(shape)


def mul_limbs_pallas(F: Field, a, b):
    """Drop-in for Field.mul on (…, 16) tensors via the Pallas kernel."""
    return _apply_binop(mulmod_t, F, a, b)


def add_limbs_pallas(F: Field, a, b):
    return _apply_binop(addmod_t, F, a, b)


def sub_limbs_pallas(F: Field, a, b):
    return _apply_binop(submod_t, F, a, b)
