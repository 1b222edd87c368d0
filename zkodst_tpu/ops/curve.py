"""BN254 G1 group ops in JAX — batched, branchless, TPU-native.

Replaces the reference stack's `halo2curves` bn256 G1 point arithmetic that
`best_multiexp` drives (SURVEY.md §2.3 N8). Points are **homogeneous
projective** (X:Y:Z) with each coordinate a (..., 16) uint32 Fq Montgomery
limb array, so a "point" is a (..., 3, 16) tensor and every group op is
elementwise over the leading axes.

We use the complete addition/doubling formulas for a=0 short-Weierstrass
curves (Renes–Costello–Batina 2016, Algs. 7/9): no branches on the data —
identity (0:1:0), P+P, P+(-P) all flow through the same multiplies, which is
exactly what a TPU wants (lax-friendly, no data-dependent control flow).
Cost: add = 12M + adds; double = 6M + 2S + adds; mul-by-3b (b3 = 9) is done
with cheap field additions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .field import FQ, Field
from . import pycurve

F = FQ


def _mul9(x):
    """9*x via 3 doublings + add (cheaper than a full field mul)."""
    x2 = F.add(x, x)
    x4 = F.add(x2, x2)
    x8 = F.add(x4, x4)
    return F.add(x8, x)


def identity(shape=()) -> jnp.ndarray:
    """(…, 3, 16) identity points (0 : 1 : 0)."""
    z = np.zeros(tuple(shape) + (3, 16), np.uint32)
    z[..., 1, :] = F.ONE
    return jnp.asarray(z)


def from_affine_ints(pts) -> np.ndarray:
    """List of affine (x, y) int tuples or None -> (N, 3, 16) projective."""
    out = np.zeros((len(pts), 3, 16), np.uint32)
    for i, pt in enumerate(pts):
        if pt is None:
            out[i, 1] = F.ONE
        else:
            out[i, 0] = F.from_int(pt[0])
            out[i, 1] = F.from_int(pt[1])
            out[i, 2] = F.ONE
    return out


def to_affine_ints(pts):
    """(..., 3, 16) projective -> list of affine int tuples / None (host)."""
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


def _stack_mul(lhs, rhs):
    """One field-mul instantiation for a layer of independent products.

    The field mul contains a lax.scan; instantiating it once per *layer*
    instead of once per product keeps the XLA graph (and compile time) ~6x
    smaller per EC op — jit(add) compile dropped from 37s to seconds."""
    a = jnp.stack(lhs, axis=-2)
    b = jnp.stack(rhs, axis=-2)
    out = F.mul(a, b)
    return [out[..., i, :] for i in range(len(lhs))]


@jax.jit
def add(p, q):
    """Complete projective addition (RCB16 Alg. 7, a=0, b3=9).

    p, q: (..., 3, 16) uint32; returns p+q with identical shape. Correct for
    every input combination including doubling and the identity. On TPU
    backends with enough lanes this routes to the fused Pallas kernel
    (pallas/ec.py — the whole formula in VMEM, ~50× the jnp path); the code
    below is the CPU/reference path (products grouped into two stacked
    layers, see _stack_mul)."""
    from .field import _pallas_wanted

    if _pallas_wanted(p[..., 0, :], q[..., 0, :]):
        from ..pallas import ec

        pp, qq = jnp.broadcast_arrays(p, q)
        return ec.ec_add(pp, qq)
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

    t0, t1, t2, u1, u2, u3 = _stack_mul(
        [x1, y1, z1, F.add(x1, y1), F.add(y1, z1), F.add(x1, z1)],
        [x2, y2, z2, F.add(x2, y2), F.add(y2, z2), F.add(x2, z2)])
    t3 = F.sub(u1, F.add(t0, t1))                       # x1y2 + x2y1
    t4 = F.sub(u2, F.add(t1, t2))                       # y1z2 + y2z1
    w3 = F.sub(u3, F.add(t0, t2))                       # x1z2 + x2z1
    t0_3 = F.add(F.add(t0, t0), t0)                     # 3*x1x2
    t2_9 = _mul9(t2)                                     # b3 * z1z2
    z3 = F.add(t1, t2_9)
    t1m = F.sub(t1, t2_9)
    y3 = _mul9(w3)                                       # b3 * (x1z2+x2z1)
    a, b, c, d, e, f = _stack_mul(
        [t3, t4, y3, t1m, z3, t0_3],
        [t1m, y3, t0_3, z3, t4, t3])
    return jnp.stack(
        [F.sub(a, b), F.add(c, d), F.add(e, f)], axis=-2)


@jax.jit
def double(p):
    """Complete projective doubling (RCB16 Alg. 9, a=0, b3=9), products
    grouped into three stacked layers."""
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    t0, t1, xy, t2 = _stack_mul([y, y, x, z], [y, z, y, z])
    z3 = F.add(t0, t0)
    z3 = F.add(z3, z3)
    z3 = F.add(z3, z3)                                   # 8y^2
    t2 = _mul9(t2)                                       # b3 z^2
    x3, z3o = _stack_mul([t2, t1], [z3, z3])
    y3 = F.add(t0, t2)
    t1b = F.add(t2, t2)
    t2b = F.add(t1b, t2)                                 # 3 b3 z^2
    t0 = F.sub(t0, t2b)
    ya, xa = _stack_mul([t0, t0], [y3, xy])
    y3 = F.add(ya, x3)
    x3 = F.add(xa, xa)
    return jnp.stack([x3, y3, z3o], axis=-2)


@jax.jit
def neg(p):
    return p.at[..., 1, :].set(F.neg(p[..., 1, :]))


def select(cond, p, q):
    """Elementwise point select: cond ? p : q (cond shape = leading axes)."""
    return jnp.where(jnp.asarray(cond)[..., None, None], p, q)


@jax.jit
def is_identity(p):
    return F.is_zero(p[..., 2, :])


def scalar_mul_static(p, k: int):
    """p * k for a static Python-int scalar (host-unrolled double&add)."""
    k %= pycurve.R_ORDER
    acc = jnp.broadcast_to(identity(), p.shape)
    if k == 0:
        return acc
    for bit in bin(k)[2:]:
        acc = double(acc)
        if bit == "1":
            acc = add(acc, p)
    return acc


@jax.jit
def scalar_mul(p, k_limbs):
    """p * k for traced scalars.

    p: (..., 3, 16); k_limbs: (..., 16) uint32 — 16-bit limbs of the scalar
    in NORMAL (non-Montgomery) form. Fixed 256 double-and-add iterations
    under lax.scan (MSB-first), fully batched."""
    bits_per_limb = 16

    def body(acc, i):
        # bit index from MSB: limb = 15 - i//16, bit = 15 - i%16
        limb = (255 - i) // bits_per_limb
        sh = (255 - i) % bits_per_limb
        b = (jnp.take(k_limbs, limb, axis=-1) >> sh) & 1
        acc = double(acc)
        return select(b == 1, add(acc, p), acc), None

    acc0 = jnp.broadcast_to(identity(), p.shape)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(256, dtype=jnp.uint32))
    return acc


def eq_points(p, q):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (batched),
    with identity == identity handled (both Z zero)."""
    x1z2 = F.mul(p[..., 0, :], q[..., 2, :])
    x2z1 = F.mul(q[..., 0, :], p[..., 2, :])
    y1z2 = F.mul(p[..., 1, :], q[..., 2, :])
    y2z1 = F.mul(q[..., 1, :], p[..., 2, :])
    both_inf = jnp.logical_and(is_identity(p), is_identity(q))
    same = jnp.logical_and(F.eq(x1z2, x2z1), F.eq(y1z2, y2z1))
    return jnp.logical_or(both_inf, same)
