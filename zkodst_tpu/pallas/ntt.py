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

# tail-kernel slab (lanes); also the head-stage lane tile. Measured on
# v5e round 5: T=4096 is no better than 2048 and T=8192 fails to
# compile (VMEM) — the tail kernel is compute/issue-bound, not
# program-count-bound (docs/PERF.md).
TILE = int(_os.environ.get("ZKODST_NTT_TILE", "2048"))

# First head-style stage. Round-5 profiling: a tail stage costs ~4 ms
# per (8, 16, 2^17) pass (full-lane twiddle mul + 2 rolls + select, and
# register pressure), a head stage ~1 ms (contiguous u/v halves → mul
# on HALF the lanes, no shuffles). Head blocks need the butterfly
# half-width on the LANE axis, so h ≥ 128 (the v5e lane tile); stages
# h < HEAD_MIN stay in the fused tail kernel.
HEAD_MIN = int(_os.environ.get("ZKODST_NTT_HEAD_MIN", "128"))


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
        xv2d = pltpu.roll(x2d, (-h) % T, axis=1)     # at u-lane j: x[j+h]
        x = [x2d[i, :] for i in range(L)]
        xv = [xv2d[i, :] for i in range(L)]
        if s == 0:
            t = xv                                   # stage-0 twiddle ≡ 1
        else:
            tw = [tw_ref[s, i, :] for i in range(L)]
            t = _vec_mul(xv, tw, pv, pinv16, zero)   # w·v   (at u lanes)
        plus = _vec_add(x, t, pv, zero)              # u + w·v
        minus = _vec_sub(x, t, pv, zero)             # u − w·v
        md2d = pltpu.roll(to2d(minus), h, axis=1)    # at v-lane j+h: minus[j]
        is_u = (lane & np.uint32(h)) == 0
        x2d = jnp.where(is_u[None, :], to2d(plus), md2d)
    o_ref[0, :, :] = x2d


def _head_kernel(p_limbs, pinv16, x_ref, tw_ref, o_ref):
    """One h ≥ HEAD_MIN stage; x_ref (1, 16, G, 2, Ta): u at [..., 0, :],
    v at [..., 1, :]. G > 1 packs several butterfly groups per program
    when h < TILE, so every program still moves a full slab — the mul
    runs on HALF the lanes (the v halves), which is why a head-style
    stage costs ~¼ of a tail stage (round-5 measurement)."""
    zero = jnp.zeros((x_ref.shape[-1],), jnp.uint32)
    pv = [np.uint32(v) for v in p_limbs]
    G = x_ref.shape[2]
    tw = [tw_ref[i, :] for i in range(L)]
    for g in range(G):
        u = [x_ref[0, i, g, 0, :] for i in range(L)]
        v = [x_ref[0, i, g, 1, :] for i in range(L)]
        t = _vec_mul(v, tw, pv, pinv16, zero)
        plus = _vec_add(u, t, pv, zero)
        minus = _vec_sub(u, t, pv, zero)
        for i in range(L):
            o_ref[0, i, g, 0, :] = plus[i]
            o_ref[0, i, g, 1, :] = minus[i]


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

    key = (F._key, n, w, TILE, HEAD_MIN)
    if key in _PLANS:
        return _PLANS[key]
    T = min(TILE, n)
    hmin = min(HEAD_MIN, T)
    g = powers_table(F, w, max(1, n // 2)).T         # (16, n/2): w^j
    tails = []
    for s in range(hmin.bit_length() - 1):           # h = 1 … hmin/2
        h = 1 << s
        th = jax.lax.slice(g, (0, 0), (L, h * (n // (2 * h))),
                           (1, n // (2 * h)))        # (16, h) strided
        tails.append(jnp.tile(th, (1, T // h)))
    tail_tw = jnp.stack(tails) if tails else jnp.zeros((0, L, T), jnp.uint32)
    heads = []
    h = hmin
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

    Bit-reversal: one flat n-row gather measured 13–15 ms per
    (8, ·, 2^17) call on v5e in EITHER layout (XLA TPU gathers are
    granularity-bound, not bandwidth-bound). For n > 2^12 it runs
    instead as the tensor-product factorization
    rev_k = rev_11 ⊗ rev_{k-11}: two COARSE axis permutations on a
    (B, 2^11, 2^{k-11}, 16) view (chunked takes with multi-KB rows)
    plus one structured transpose. Both layout transposes live inside
    this jit, so eager callers pay one dispatch."""
    k = n.bit_length() - 1
    if k > 12:
        k2, k1 = 11, k - 11
        rev2 = jnp.asarray(_bitrev(1 << k2))
        rev1 = jnp.asarray(_bitrev(1 << k1))
        y = a2.reshape(-1, 1 << k2, 1 << k1, L)
        z = jnp.take(jnp.take(y, rev2, axis=1), rev1, axis=2)
        a2 = jnp.transpose(z, (0, 2, 1, 3)).reshape(-1, n, L)
    else:
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
    hmin = min(HEAD_MIN, T)
    p_limbs = tuple(int(v) for v in F.P)
    pinv16 = np.uint32(F.pinv16)
    stages = hmin.bit_length() - 1
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
    h = hmin
    for tw in head_tws:
        nb = n // (2 * h)
        xv = xt.reshape(B, L, nb, 2, h)
        Ta = min(h, TILE)
        G = max(1, min(nb, TILE // (2 * h)))         # groups per program
        xt = pl.pallas_call(
            partial(_head_kernel, p_limbs, pinv16),
            out_shape=jax.ShapeDtypeStruct((B, L, nb, 2, h), jnp.uint32),
            grid=(B, nb // G, h // Ta),
            in_specs=[
                pl.BlockSpec((1, L, G, 2, Ta),
                             lambda b, i, j: (b, 0, i, 0, j)),
                pl.BlockSpec((L, Ta), lambda b, i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, L, G, 2, Ta),
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
