"""Short-Weierstrass G1 group ops in JAX — batched, branchless, TPU-native.

Replaces the reference stack's point arithmetic (`halo2curves` bn256 for
the KZG path, `pasta_curves` pallas for the zcash-halo2 path — SURVEY.md
§2.3 N6/N8). Points are **homogeneous projective** (X:Y:Z) with each
coordinate a (..., 16) uint32 Montgomery limb array, so a "point" is a
(..., 3, 16) tensor and every group op is elementwise over the leading
axes.

We use the complete addition/doubling formulas for a=0 short-Weierstrass
curves (Renes–Costello–Batina 2016, Algs. 7/9): no branches on the data —
identity (0:1:0), P+P, P+(-P) all flow through the same multiplies, which
is exactly what a TPU wants (lax-friendly, no data-dependent control
flow). Cost: add = 12M + adds; double = 6M + 2S + adds; mul-by-3b is done
with cheap field additions.

Curves are instances of :class:`CurveOps` (field + curve-b + kernel
routing); the module-level functions are the BN254 instance (y² = x³ + 3,
b3 = 9, Pallas-kernel routed on TPU) for backward compatibility. The
Pasta "pallas" curve of the reference's circuit crate (y² = x³ + 5 over
PALLAS_BASE — table16.rs:93-98) is :data:`PASTA`, jnp-path only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .field import FQ, Field
from . import pycurve


class CurveOps:
    """Group ops for one a=0 short-Weierstrass curve over `F` with
    constant b. Hashable/static so instances can be jit static args."""

    def __init__(self, F: Field, b: int, name: str,
                 use_pallas: bool = False):
        self.F = F
        self.b = b
        self.b3 = 3 * b
        self.name = name
        self.use_pallas = use_pallas    # fused BN254 kernels (pallas/ec.py)
        self._jit_add = jax.jit(self._add_impl)
        self._jit_double = jax.jit(self._double_impl)
        self._jit_neg = jax.jit(self._neg_impl)
        self._jit_scalar_mul = jax.jit(self._scalar_mul_impl)

    def __hash__(self):
        return hash((self.name, self.b))

    def __eq__(self, other):
        return (isinstance(other, CurveOps)
                and (self.name, self.b) == (other.name, other.b))

    def __repr__(self):
        return f"CurveOps({self.name})"

    # -- constants ---------------------------------------------------------
    def _mul_b3(self, x):
        """b3·x via doubling/add chain on the (small) static constant."""
        F = self.F
        k = self.b3
        acc = None
        base = x
        while k:
            if k & 1:
                acc = base if acc is None else F.add(acc, base)
            k >>= 1
            if k:
                base = F.add(base, base)
        return acc

    def identity(self, shape=()) -> jnp.ndarray:
        """(…, 3, 16) identity points (0 : 1 : 0)."""
        z = np.zeros(tuple(shape) + (3, 16), np.uint32)
        z[..., 1, :] = self.F.ONE
        return jnp.asarray(z)

    # -- host <-> device ---------------------------------------------------
    def from_affine_ints(self, pts) -> np.ndarray:
        """List of affine (x, y) int tuples or None -> (N, 3, 16)."""
        F = self.F
        out = np.zeros((len(pts), 3, 16), np.uint32)
        for i, pt in enumerate(pts):
            if pt is None:
                out[i, 1] = F.ONE
            else:
                out[i, 0] = F.from_int(pt[0])
                out[i, 1] = F.from_int(pt[1])
                out[i, 2] = F.ONE
        return out

    def to_affine_ints(self, pts):
        """(..., 3, 16) projective -> list of affine tuples / None."""
        F = self.F
        pts = np.asarray(pts)
        flat = pts.reshape(-1, 3, 16)
        out = []
        for i in range(flat.shape[0]):
            x, y, z = (F.to_int(flat[i, j]) for j in range(3))
            if z == 0:
                out.append(None)
            else:
                zinv = pow(z, -1, F.p)
                out.append((x * zinv % F.p, y * zinv % F.p))
        return out

    # -- group ops ---------------------------------------------------------
    def _stack_mul(self, lhs, rhs):
        """One field-mul instantiation for a layer of independent products
        (keeps the XLA graph ~6x smaller per EC op — the field mul
        contains a lax.scan)."""
        a = jnp.stack(lhs, axis=-2)
        b = jnp.stack(rhs, axis=-2)
        out = self.F.mul(a, b)
        return [out[..., i, :] for i in range(len(lhs))]

    def _add_impl(self, p, q):
        F = self.F
        x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
        t0, t1, t2, u1, u2, u3 = self._stack_mul(
            [x1, y1, z1, F.add(x1, y1), F.add(y1, z1), F.add(x1, z1)],
            [x2, y2, z2, F.add(x2, y2), F.add(y2, z2), F.add(x2, z2)])
        t3 = F.sub(u1, F.add(t0, t1))                   # x1y2 + x2y1
        t4 = F.sub(u2, F.add(t1, t2))                   # y1z2 + y2z1
        w3 = F.sub(u3, F.add(t0, t2))                   # x1z2 + x2z1
        t0_3 = F.add(F.add(t0, t0), t0)                 # 3*x1x2
        t2_b3 = self._mul_b3(t2)                        # b3 * z1z2
        z3 = F.add(t1, t2_b3)
        t1m = F.sub(t1, t2_b3)
        y3 = self._mul_b3(w3)                           # b3 * (x1z2+x2z1)
        a, b, c, d, e, f = self._stack_mul(
            [t3, t4, y3, t1m, z3, t0_3],
            [t1m, y3, t0_3, z3, t4, t3])
        return jnp.stack(
            [F.sub(a, b), F.add(c, d), F.add(e, f)], axis=-2)

    def add(self, p, q):
        """Complete projective addition (RCB16 Alg. 7, a=0)."""
        if self.use_pallas:
            from .field import _pallas_wanted

            if _pallas_wanted(p[..., 0, :], q[..., 0, :]):
                from ..pallas import ec

                pp, qq = jnp.broadcast_arrays(p, q)
                return ec.ec_add(pp, qq)
        return self._jit_add(p, q)

    def _double_impl(self, p):
        F = self.F
        x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        t0, t1, xy, t2 = self._stack_mul([y, y, x, z], [y, z, y, z])
        z3 = F.add(t0, t0)
        z3 = F.add(z3, z3)
        z3 = F.add(z3, z3)                              # 8y^2
        t2 = self._mul_b3(t2)                           # b3 z^2
        x3, z3o = self._stack_mul([t2, t1], [z3, z3])
        y3 = F.add(t0, t2)
        t1b = F.add(t2, t2)
        t2b = F.add(t1b, t2)                            # 3 b3 z^2
        t0 = F.sub(t0, t2b)
        ya, xa = self._stack_mul([t0, t0], [y3, xy])
        y3 = F.add(ya, x3)
        x3 = F.add(xa, xa)
        return jnp.stack([x3, y3, z3o], axis=-2)

    def double(self, p):
        """Complete projective doubling (RCB16 Alg. 9, a=0)."""
        return self._jit_double(p)

    def _neg_impl(self, p):
        return p.at[..., 1, :].set(self.F.neg(p[..., 1, :]))

    def neg(self, p):
        return self._jit_neg(p)

    def select(self, cond, p, q):
        return jnp.where(jnp.asarray(cond)[..., None, None], p, q)

    def is_identity(self, p):
        return self.F.is_zero(p[..., 2, :])

    def scalar_mul_static(self, p, k: int, order: int):
        """p * k for a static Python-int scalar (host-unrolled)."""
        k %= order
        acc = jnp.broadcast_to(self.identity(), p.shape)
        if k == 0:
            return acc
        for bit in bin(k)[2:]:
            acc = self.double(acc)
            if bit == "1":
                acc = self.add(acc, p)
        return acc

    def _scalar_mul_impl(self, p, k_limbs):
        bits_per_limb = 16

        def body(acc, i):
            limb = (255 - i) // bits_per_limb
            sh = (255 - i) % bits_per_limb
            b = (jnp.take(k_limbs, limb, axis=-1) >> sh) & 1
            acc = self._jit_double(acc)
            return self.select(b == 1, self._jit_add(acc, p), acc), None

        acc0 = jnp.broadcast_to(self.identity(), p.shape)
        acc, _ = jax.lax.scan(body, acc0,
                              jnp.arange(256, dtype=jnp.uint32))
        return acc

    def scalar_mul(self, p, k_limbs):
        """p * k: k_limbs (..., 16) NORMAL-form 16-bit limbs; fixed 256
        double-and-add iterations under lax.scan, fully batched."""
        return self._jit_scalar_mul(p, k_limbs)

    def eq_points(self, p, q):
        """Projective equality (identity==identity handled)."""
        F = self.F
        x1z2 = F.mul(p[..., 0, :], q[..., 2, :])
        x2z1 = F.mul(q[..., 0, :], p[..., 2, :])
        y1z2 = F.mul(p[..., 1, :], q[..., 2, :])
        y2z1 = F.mul(q[..., 1, :], p[..., 2, :])
        both_inf = jnp.logical_and(self.is_identity(p),
                                   self.is_identity(q))
        same = jnp.logical_and(F.eq(x1z2, x2z1), F.eq(y1z2, y2z1))
        return jnp.logical_or(both_inf, same)


BN254 = CurveOps(FQ, 3, "bn254_g1", use_pallas=True)

from .field import Field as _Field  # noqa: E402
from .pyfield import PALLAS_BASE as _PALLAS_BASE  # noqa: E402

# the Pasta "pallas" curve (y² = x³ + 5); base field = PALLAS_BASE,
# scalar field = VESTA_BASE. jnp path only (the fused kernels are BN254).
PASTA_FP = _Field(_PALLAS_BASE, "pasta_fp")
PASTA = CurveOps(PASTA_FP, 5, "pasta_g1", use_pallas=False)

F = FQ

# ---------------------------------------------------------------------------
# module-level BN254 API (backward compatible)
# ---------------------------------------------------------------------------


def identity(shape=()) -> jnp.ndarray:
    return BN254.identity(shape)


def from_affine_ints(pts) -> np.ndarray:
    return BN254.from_affine_ints(pts)


def to_affine_ints(pts):
    return BN254.to_affine_ints(pts)


def add(p, q):
    return BN254.add(p, q)


def double(p):
    return BN254.double(p)


def neg(p):
    return BN254.neg(p)


def select(cond, p, q):
    return BN254.select(cond, p, q)


def is_identity(p):
    return BN254.is_identity(p)


def scalar_mul_static(p, k: int):
    return BN254.scalar_mul_static(p, k, pycurve.R_ORDER)


def scalar_mul(p, k_limbs):
    return BN254.scalar_mul(p, k_limbs)


def eq_points(p, q):
    return BN254.eq_points(p, q)
