"""Pallas TPU kernel: fused radix-2 NTT butterflies (limb-major layout).

TPU-native replacement for the `lax.scan` constant-geometry NTT in
ops/ntt.py — the hot loop of the reference's `halo2_proofs::poly::
EvaluationDomain` FFT (SURVEY.md §2.3 N7). The scan path pays, per stage,
two full-array gathers on (n, 16)-layout tensors (8× lane padding) plus
transposes around every Pallas field op; at k=17+quotient sizes that made
the NTT content of the quotient/commit phases the dominant prover cost
(docs/PERF.md round 1).

Design — no gathers at all:

* Data is limb-major ``(B, 16, n)`` uint32: limbs on sublanes, the domain
  on lanes. One bit-reversal permutation + transpose on entry (XLA copy),
  then classic in-place DIT stages, small stride → large stride.
* **Tail stages (half-block h < TILE)** run in ONE kernel per NTT: each
  grid program keeps a (16, TILE) slab in VMEM and applies all
  log2(TILE) stages back-to-back with `pltpu.roll` lane shifts — the
  butterfly partner is always within the slab because 2h ≤ TILE.
  Twiddles for all tail stages ship as one (stages, 16, TILE)
  VMEM-resident stack (tables are h-periodic, pre-tiled).
* **Head stages (h ≥ TILE)** use a rank-5 *view* (B, 16, n/2h, 2, h):
  blocking the size-2 axis puts the u and v butterfly operands in the
  same VMEM block at the same lane offset — the "gather" is a BlockSpec.
  One kernel launch per head stage, (16, Ta) lane tiles.

Montgomery arithmetic reuses the register-level limb primitives from
pallas/mulmod.py (16×16-bit limbs, CIOS reduction), so each stage is a
single fused VMEM pass: ~24 MB of HBM traffic per stage at k=17 versus
~10 full-array round-trips for the scan path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import Field
from .mulmod import L, _vec_add, _vec_mul, _vec_sub

import os as _os

# tail-kernel slab (lanes); also the head-stage lane tile. Bigger slabs
# mean fewer grid programs (each with a fixed DMA/setup cost) and more
# fused stages per program — measured on v5e round 5 (see docs/PERF.md).
TILE = int(_os.environ.get("ZKODST_NTT_TILE", "8192"))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _tail_kernel(p_limbs, pinv16, stages: int, x_ref, tw_ref, o_ref):
    """All stages h = 1 … 2^(stages-1) on one (16, T) VMEM slab.

    tw_ref: (stages, 16, T) — row s holds w^{(n/2h)·(j mod h)} at lane j
    (h = 2^s), i.e. the stage table pre-tiled to the slab width.

    The butterfly-partner alignment is TWO whole-(16, T) lane rolls per
    stage — the original per-limb-row formulation issued 32 separate
    (1, T) rolls per stage (352/program), which profiling showed was most
    of the kernel's 4× overhead over its compute floor
    (scripts/profile_components.py round 5: tail = 50.4 of 67 ms)."""
    from jax.experimental.pallas import tpu as pltpu

    T = x_ref.shape[2]
    zero = jnp.zeros((T,), jnp.uint32)
    pv = [np.uint32(v) for v in p_limbs]
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, T), 1).reshape(-1)

    def to2d(rows):
        return jnp.concatenate([r.reshape(1, -1) for r in rows], axis=0)

    x2d = x_ref[0, :, :]                             # (16, T)
    for s in range(stages):
        h = 1 << s
        tw = [tw_ref[s, i, :] for i in range(L)]
        xv2d = pltpu.roll(x2d, (-h) % T, axis=1)     # at u-lane j: x[j+h]
        x = [x2d[i, :] for i in range(L)]
        xv = [xv2d[i, :] for i in range(L)]
        t = _vec_mul(xv, tw, pv, pinv16, zero)       # w·v   (at u lanes)
        plus = _vec_add(x, t, pv, zero)              # u + w·v
        minus = _vec_sub(x, t, pv, zero)             # u − w·v
        md2d = pltpu.roll(to2d(minus), h, axis=1)    # at v-lane j+h: minus[j]
        is_u = (lane & np.uint32(h)) == 0
        x2d = jnp.where(is_u[None, :], to2d(plus), md2d)
    o_ref[0, :, :] = x2d


def _head_kernel(p_limbs, pinv16, x_ref, tw_ref, o_ref):
    """One h ≥ TILE stage; x_ref (1, 16, 1, 2, Ta): [...,0,:]=u, [...,1,:]=v."""
    zero = jnp.zeros((x_ref.shape[-1],), jnp.uint32)
    pv = [np.uint32(v) for v in p_limbs]
    u = [x_ref[0, i, 0, 0, :] for i in range(L)]
    v = [x_ref[0, i, 0, 1, :] for i in range(L)]
    tw = [tw_ref[i, :] for i in range(L)]
    t = _vec_mul(v, tw, pv, pinv16, zero)
    plus = _vec_add(u, t, pv, zero)
    minus = _vec_sub(u, t, pv, zero)
    for i in range(L):
        o_ref[0, i, 0, 0, :] = plus[i]
        o_ref[0, i, 0, 1, :] = minus[i]


# ---------------------------------------------------------------------------
# twiddle / permutation plans (device-resident, cached per (field, n, w))
# ---------------------------------------------------------------------------

_PLANS: dict = {}


def _bitrev(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev.astype(np.int32)


def _plan(F: Field, n: int, w: int):
    """(rev, tail_tw (sB,16,T'), [head_tw (16,h)] for h=T'…n/2)."""
    from ..ops.ntt import powers_table

    key = (F._key, n, w, TILE)
    if key in _PLANS:
        return _PLANS[key]
    T = min(TILE, n)
    g = powers_table(F, w, max(1, n // 2)).T         # (16, n/2): w^j
    tails = []
    for s in range(T.bit_length() - 1):              # h = 1 … T/2
        h = 1 << s
        th = jax.lax.slice(g, (0, 0), (L, h * (n // (2 * h))),
                           (1, n // (2 * h)))        # (16, h) strided
        tails.append(jnp.tile(th, (1, T // h)))
    tail_tw = jnp.stack(tails) if tails else jnp.zeros((0, L, T), jnp.uint32)
    heads = []
    h = T
    while h <= n // 2:
        heads.append(jax.lax.slice(g, (0, 0), (L, h * (n // (2 * h))),
                                   (1, n // (2 * h))))
        h *= 2
    plan = (jnp.asarray(_bitrev(n)), tail_tw, heads)
    from ..ops.ntt import _tracing

    if not _tracing():
        _PLANS[key] = plan
    return plan


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 2))
def _ntt_rows(F: Field, a2, n: int, rev, tail_tw, *head_tws):
    """DIT NTT on (B, n, 16) row-major tensors, natural order in/out.

    The bit-reversal runs as a ROW gather here (contiguous 64-B rows)
    before the limb-major transpose — the previous lane-axis gather on
    the (B, 16, n) layout measured 13.4 ms of the 67 ms k=17 batch-8
    transform (scripts/profile_components.py). Both layout transposes
    live inside this jit, so eager callers pay one dispatch."""
    a2 = jnp.take(a2, rev, axis=1)
    xt = jnp.moveaxis(a2, -1, 1)                     # (B, 16, n)
    out = _ntt_limb_major(F, xt, n, tail_tw, *head_tws)
    return jnp.moveaxis(out, 1, -1)


@partial(jax.jit, static_argnums=(0, 2))
def _ntt_limb_major(F: Field, xt, n: int, tail_tw, *head_tws):
    """DIT NTT on (B, 16, n) limb-major tensors (input in bit-reversed
    lane order)."""
    from jax.experimental import pallas as pl

    B = xt.shape[0]
    T = min(TILE, n)
    p_limbs = tuple(int(v) for v in F.P)
    pinv16 = np.uint32(F.pinv16)
    stages = T.bit_length() - 1
    if stages:
        xt = pl.pallas_call(
            partial(_tail_kernel, p_limbs, pinv16, stages),
            out_shape=jax.ShapeDtypeStruct((B, L, n), jnp.uint32),
            grid=(B, n // T),
            in_specs=[
                pl.BlockSpec((1, L, T), lambda b, c: (b, 0, c)),
                pl.BlockSpec((tail_tw.shape[0], L, T),
                             lambda b, c: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, L, T), lambda b, c: (b, 0, c)),
        )(xt.reshape(B, L, n), tail_tw).reshape(B, L, n)
    h = T
    for tw in head_tws:
        nb = n // (2 * h)
        xv = xt.reshape(B, L, nb, 2, h)
        Ta = min(h, TILE)
        xt = pl.pallas_call(
            partial(_head_kernel, p_limbs, pinv16),
            out_shape=jax.ShapeDtypeStruct((B, L, nb, 2, h), jnp.uint32),
            grid=(B, nb, h // Ta),
            in_specs=[
                pl.BlockSpec((1, L, 1, 2, Ta),
                             lambda b, i, j: (b, 0, i, 0, j)),
                pl.BlockSpec((L, Ta), lambda b, i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, L, 1, 2, Ta),
                                   lambda b, i, j: (b, 0, i, 0, j)),
        )(xv, tw).reshape(B, L, n)
        h *= 2
    return xt


def ntt_pallas(F: Field, a, w: int):
    """Forward NTT along axis -2 of (..., n, 16) tensors (natural order
    in and out) — drop-in for ops.ntt.ntt's device path.

    Dispatches through a jax.export artifact when present (utils/aot.py):
    the limb-major graph costs ~35 s lowering + ~40 s compile-cache load
    per (B, n) shape per process — ×8 shapes in a k=17 prove. Twiddles
    are runtime operands, so one artifact serves every root w."""
    from ..utils import aot

    shape = a.shape
    n = shape[-2]
    rev, tail_tw, heads = _plan(F, n, w)
    a2 = a.reshape(-1, n, L)
    key = (f"ntt_rows_{F._key[0]}_B{a2.shape[0]}_n{n}"
           f"_T{min(TILE, n)}")
    out = aot.call(
        key, lambda x, r, t, *h: _ntt_rows(F, x, n, r, t, *h),
        a2, rev, tail_tw, *heads)
    return out.reshape(shape)
