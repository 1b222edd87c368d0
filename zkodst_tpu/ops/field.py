"""Limb-vectorized prime-field arithmetic in JAX (TPU-native).

This is the device-side equivalent of the reference's Rust field backends
(`pasta_curves` Fp / PSE `halo2curves` BN254 Fr/Fq — SURVEY.md §2.3 N6),
re-designed for 32-bit vector lanes:

* A field element is a little-endian array of **16 limbs × 16 bits**, stored
  as ``uint32`` with shape ``(..., 16)``; all ops are elementwise over the
  leading axes so a "field op" is really a whole batch of them (columns of a
  circuit, a full NTT domain, every point coordinate of an MSM window).
* Elements are kept in **Montgomery form** (R = 2^256) on device; conversion
  happens host-side in :func:`Field.from_ints` / :func:`Field.to_ints`.
* Multiplication = 16×16 schoolbook partial products (each < 2^32, exact in
  uint32) split lo/hi and accumulated into redundant < 2^22 columns, then a
  16-step Montgomery reduction — no 64-bit integers anywhere, which is what
  makes this fast on TPU (and later a clean int8-MXU Pallas kernel).
* Limb loops are unrolled at trace time (static length 16); exponentiation
  runs under ``lax.scan`` over a static bit schedule so graphs stay small.

Correctness oracle: :mod:`.pyfield` (plain Python ints); see
tests/test_field.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pyfield

L = 16          # limbs per element
LB = 16         # bits per limb
LIMB_MASK = np.uint32(0xFFFF)
R_BITS = L * LB  # 256

_PALLAS_MIN_LANES = 1024


def _pallas_wanted(a, b) -> bool:
    """Trace-time routing decision for Field.mul (TPU + big batch only).

    ZKODST_NO_PALLAS=1 disables the kernel path (debugging/fallback)."""
    import os

    if os.environ.get("ZKODST_NO_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend not in ("tpu", "axon"):
        return False
    shape = np.broadcast_shapes(np.shape(a)[:-1], np.shape(b)[:-1])
    return int(np.prod(shape, dtype=np.int64)) >= _PALLAS_MIN_LANES


def int_to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (LB * i)) & 0xFFFF for i in range(L)],
                    dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    return sum(int(limbs[..., i]) << (LB * i) for i in range(L))


class Field:
    """Static per-modulus configuration + JAX ops (Montgomery form)."""

    def __init__(self, p: int, name: str = "field"):
        self.p = p
        self.name = name
        self._key = (name, p)
        self.py = pyfield.PF(p, name)
        self.r = (1 << R_BITS) % p
        self.r2 = (self.r * self.r) % p
        # -p^{-1} mod 2^16 (per-limb Montgomery factor)
        self.pinv16 = np.uint32((-pow(p, -1, 1 << LB)) % (1 << LB))
        self.P = int_to_limbs(p)
        self.ONE = int_to_limbs(self.r)         # 1 in Montgomery form
        self.ZERO = np.zeros(L, np.uint32)
        self.R2 = int_to_limbs(self.r2)

    # hashable/static so Field can be a `jit` static argument
    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, Field) and self._key == other._key

    def __repr__(self):
        return f"Field({self.name})"

    # ------------------------------------------------------------------
    # host <-> device representation
    # ------------------------------------------------------------------
    def from_ints(self, xs) -> np.ndarray:
        """Python ints -> (..., 16) uint32 Montgomery limbs (host-side)."""
        arr = np.asarray(xs, dtype=object)
        flat = [(int(x) % self.p) * self.r % self.p for x in arr.ravel()]
        out = np.empty((len(flat), L), np.uint32)
        for i, v in enumerate(flat):
            out[i] = int_to_limbs(v)
        return out.reshape(arr.shape + (L,))

    def from_int(self, x: int) -> np.ndarray:
        return self.from_ints(np.asarray(x, dtype=object))

    def to_ints(self, limbs) -> np.ndarray:
        """(..., 16) Montgomery limbs -> object ndarray of Python ints."""
        limbs = np.asarray(limbs)
        shape = limbs.shape[:-1]
        rinv = pow(self.r, -1, self.p)
        flat = limbs.reshape(-1, L)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = limbs_to_int(flat[i]) * rinv % self.p
        return out.reshape(shape)

    def to_int(self, limbs) -> int:
        return int(self.to_ints(np.asarray(limbs)[None])[0])

    # ------------------------------------------------------------------
    # carry machinery — Kogge–Stone parallel-prefix, log2(L) whole-vector
    # steps along the limb axis. The naive 16-step ripple loop produced long
    # scalar-slice chains that XLA compiled in >1s PER add/sub; these
    # formulations compile in ~0.1s and vectorize across limbs.
    # ------------------------------------------------------------------
    @staticmethod
    def _shift_up(x, d: int, fill):
        """x[..., i] <- x[..., i-d], filling the low d limbs with `fill`."""
        pad = jnp.full(x.shape[:-1] + (d,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-d]], axis=-1)

    @classmethod
    def _ks_carry(cls, s):
        """Resolve carries of s (limbs < 2^17) exactly.

        Returns (r, carry_out) with r < 2^16 limbwise; carry_out ∈ {0,1} is
        the carry beyond the last limb."""
        g = s >> LB                     # carry generate ∈ {0,1}
        r = s & LIMB_MASK
        p = (r == LIMB_MASK).astype(jnp.uint32)  # carry propagate
        n = s.shape[-1]
        d = 1
        while d < n:
            g = g | (p & cls._shift_up(g, d, 0))
            p = p & cls._shift_up(p, d, 1)
            d *= 2
        carry_in = cls._shift_up(g, 1, 0)
        carry_out = g[..., -1]
        return (r + carry_in) & LIMB_MASK, carry_out

    @classmethod
    def _fold_carry(cls, t):
        """Normalize limbs < 2^31 to exact 16-bit limbs (same width).

        The high parts beyond the last limb must be zero by value-range
        arguments at the call sites."""
        lo = t & LIMB_MASK
        hi = t >> LB
        s = lo + cls._shift_up(hi, 1, 0)   # limbs < 2^16 + 2^15
        r, _ = cls._ks_carry(s)
        return r

    def _ks_sub(self, a, b):
        """a - b limbwise via two's complement; returns (diff, no_borrow).

        a, b normalized 16-bit limbs; no_borrow==1 iff a >= b; diff is the
        low-2^(16n) result (exact when a >= b)."""
        s = jnp.asarray(a + (LIMB_MASK - b))
        s = s.at[..., 0].add(1)            # a + ~b + 1, limbs < 2^17
        r, carry_out = self._ks_carry(s)
        return r, carry_out

    def _cond_sub_p(self, a):
        """a - p if a >= p else a (a normalized, a < 2p)."""
        pb = jnp.broadcast_to(jnp.asarray(self.P), a.shape)
        d, no_borrow = self._ks_sub(a, pb)
        return jnp.where((no_borrow == 1)[..., None], d, a)

    def select(self, cond, x, y):
        return jnp.where(jnp.asarray(cond)[..., None], x, y)

    # ------------------------------------------------------------------
    # ring ops (Montgomery form in, Montgomery form out)
    # ------------------------------------------------------------------
    def add(self, a, b):
        if _pallas_wanted(a, b):
            from ..pallas.mulmod import add_limbs_pallas

            aa, bb = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
            return add_limbs_pallas(self, aa, bb)
        s, _ = self._ks_carry(a + b)   # a+b < 2p < 2^256: no carry-out
        return self._cond_sub_p(s)

    def sub(self, a, b):
        if _pallas_wanted(a, b):
            from ..pallas.mulmod import sub_limbs_pallas

            aa, bb = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
            return sub_limbs_pallas(self, aa, bb)
        d, no_borrow = self._ks_sub(a, b)
        dp, _ = self._ks_carry(d + jnp.asarray(self.P))  # wraps mod 2^256
        return jnp.where((no_borrow == 1)[..., None], d, dp)

    def neg(self, a):
        z = jnp.zeros_like(a)
        return self.sub(z, a)

    def double(self, a):
        return self.add(a, a)

    @staticmethod
    def _skew_sum(rows, shift0: int):
        """Σ_i shift(rows[..., i, :], i + shift0) — anti-diagonal column sums
        of an (..., L, L) partial-product matrix, via the pad/reshape skew
        trick (no scatter ops: XLA compiles this in milliseconds where a
        64-deep dynamic-update-slice chain took minutes).

        Returns (..., 2L+1) with entries < L * max(rows) (< 2^20 here)."""
        W = 2 * L + 2
        lead = rows.shape[:-2]
        z = jnp.zeros(lead + (L, shift0), jnp.uint32)
        padded = jnp.concatenate(
            [z, rows, jnp.zeros(lead + (L, W - L - shift0), jnp.uint32)],
            axis=-1)                                     # (..., L, W)
        flat = padded.reshape(lead + (L * W,))
        flat = flat[..., : L * (W - 1)]
        return flat.reshape(lead + (L, W - 1)).sum(axis=-2)  # (..., 2L+1)

    def mul(self, a, b):
        """Montgomery product ab·R^{-1} mod p, batched elementwise.

        On TPU backends, large batches route through the fused Pallas
        kernel (pallas/mulmod.py — ~14× faster and no giant scan
        intermediates); the jnp path below is the CPU/reference path.
        (A flat full-word Montgomery variant — no inner scan — was tried
        for XLA:CPU compile speed and measured ~40% SLOWER to compile:
        total instruction count, not loop nesting, dominates.)"""
        if _pallas_wanted(a, b):
            from ..pallas.mulmod import mul_limbs_pallas

            aa, bb = jnp.broadcast_arrays(jnp.asarray(a), jnp.asarray(b))
            return mul_limbs_pallas(self, aa, bb)
        # partial products: (..., L, L) uint32, exact (operands < 2^16)
        pp = a[..., :, None] * b[..., None, :]
        # column sums t[k] = Σ_{i+j=k} lo + Σ_{i+j=k-1} hi, each < 2^21
        t = self._skew_sum(pp & LIMB_MASK, 0) + self._skew_sum(pp >> LB, 1)
        # Montgomery reduction: 16 sequential limb eliminations under scan.
        # Invariant: current limb-to-kill sits at t[..., 0]; each step adds
        # m·p, pushes carries, and shifts the window left by one limb.
        pj = jnp.asarray(self.P)  # (L,)

        def body(t, _):
            v = t[..., 0]
            carry = v >> LB
            ti = v & LIMB_MASK
            m = (ti * self.pinv16) & LIMB_MASK           # (...,)
            mp = m[..., None] * pj                        # (..., L) < 2^32
            t = t.at[..., 0].set(ti)
            t = t.at[..., 0:L].add(mp & LIMB_MASK)
            t = t.at[..., 1:L + 1].add(mp >> LB)
            # t[..., 0] = ti + lo(m·p0) ≡ 0 (mod 2^16); push its carry too.
            t = t.at[..., 1].add(carry + (t[..., 0] >> LB))
            return jnp.concatenate(
                [t[..., 1:], jnp.zeros_like(t[..., :1])], axis=-1), None

        t, _ = jax.lax.scan(body, t, None, length=L)
        # value < 2p < 2^255 and all redundant columns nonnegative, so the
        # columns above index 15 are zero; limb 15's high part is too.
        r = self._fold_carry(t[..., :L])
        return self._cond_sub_p(r)

    def square(self, a):
        return self.mul(a, a)

    def mul_const(self, a, c: int):
        """Multiply by a static Python-int constant (c in normal form)."""
        cm = jnp.asarray(self.from_int(c))
        return self.mul(a, jnp.broadcast_to(cm, a.shape))

    # ------------------------------------------------------------------
    # exponentiation / inversion
    # ------------------------------------------------------------------
    def pow_static(self, a, e: int):
        """a^e for a static nonnegative Python-int exponent (lax.scan)."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.ONE), a.shape)
        bits = np.array([(e >> i) & 1 for i in range(e.bit_length())][::-1],
                        dtype=np.uint32)  # MSB first

        def body(acc, bit):
            acc = self.mul(acc, acc)
            acc_m = self.mul(acc, a)
            return jnp.where(bit == 1, acc_m, acc), None

        # first bit is always 1: start from a to save one square+mul
        acc0 = a
        out, _ = jax.lax.scan(body, acc0, jnp.asarray(bits[1:]))
        return out

    def inv(self, a):
        """Batched inverse via Fermat (a^(p-2)); maps 0 -> 0."""
        return self.pow_static(a, self.p - 2)

    def inv_batch(self, a):
        """Inverse of every element along axis 0 via Montgomery's trick.

        ~14× cheaper than Fermat for full columns: two Hillis–Steele
        cumulative products (≈2·log n wide muls) + ONE Fermat inversion of
        the total, then inv_i = prefix_{<i} · suffix_{>i} · total⁻¹.
        REQUIRES every element nonzero (the total would otherwise be 0 and
        poison the whole batch) — callers use it on β/γ-shifted
        denominators and vanishing evaluations, nonzero w.h.p."""
        one = jnp.broadcast_to(jnp.asarray(self.ONE), a.shape)
        incl_pre = self.cumprod_incl(a)             # ∏_{j<=i}
        incl_suf = self.cumprod_incl(a, reverse=True)   # ∏_{j>=i}
        total_inv = self.inv(incl_pre[-1])
        pre_exc = jnp.concatenate([one[:1], incl_pre[:-1]], axis=0)
        suf_exc = jnp.concatenate([incl_suf[1:], one[:1]], axis=0)
        return self.mul(self.mul(pre_exc, suf_exc),
                        jnp.broadcast_to(total_inv, a.shape))

    def cumprod_incl(self, a, reverse: bool = False):
        """Inclusive cumulative product along axis 0 of an (n, 16)
        Montgomery tensor (suffix products with reverse=True).

        TPU path: chained sequential scan in limb-major layout — ONE
        field mul per element (the Hillis–Steele fallback does log2(n)
        full-array muls, each wrapped in two layout transposes by the
        (…,16)-minor pallas adapter; round-5 profiling put the prover's
        grand-product phase almost entirely in those scans). Field
        multiplication is exact and commutative, so the association
        change cannot alter results (proof bytes are unaffected)."""
        n = a.shape[0]
        W = 2048
        x = a[::-1] if reverse else a
        if (_pallas_wanted(x, x) and a.ndim == 2 and n % W == 0
                and n // W >= 2):
            from ..pallas import mulmod as mm

            S = n // W
            xt = x.T                                       # (16, n)
            cm = jnp.moveaxis(xt.reshape(L, W, S), 1, 2).reshape(L, n)
            local = mm.chain_cumprod_t(self, cm, W)
            agg = local[:, (S - 1) * W:]                   # (16, W)
            incl = mm.cumprod_tile_t(self, agg)
            onec = jnp.asarray(self.ONE, jnp.uint32)[:, None]
            carry = jnp.concatenate([onec, incl[:, :-1]], axis=1)
            carry_full = jnp.repeat(carry, S, axis=1)      # chains contiguous
            local_nat = jnp.moveaxis(
                local.reshape(L, S, W), 1, 2).reshape(L, n)
            out = mm.mulmod_t(self, local_nat, carry_full).T
        else:
            steps = max(1, (n - 1).bit_length())
            strides = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
            ids = jnp.arange(n, dtype=jnp.int32)
            one = jnp.broadcast_to(jnp.asarray(self.ONE), x.shape)

            def body(v, stride):
                prev = jnp.roll(v, stride, axis=0)
                prev = jnp.where((ids < stride)[(...,) + (None,) *
                                                (x.ndim - 1)], one, prev)
                return self.mul(v, prev), None

            out, _ = jax.lax.scan(body, x, strides)
        return out[::-1] if reverse else out

    # ------------------------------------------------------------------
    # predicates
    # ------------------------------------------------------------------
    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def zeros(self, shape):
        return jnp.zeros(tuple(shape) + (L,), jnp.uint32)

    def ones(self, shape):
        return jnp.broadcast_to(jnp.asarray(self.ONE), tuple(shape) + (L,))


FR = Field(pyfield.BN254_FR, "bn254_fr")
FQ = Field(pyfield.BN254_FQ, "bn254_fq")
