"""Number-theoretic transform over limb-vectorized fields (JAX, TPU-native).

Replaces the reference's `halo2_proofs::poly::EvaluationDomain` FFT machinery
(SURVEY.md §2.3 N7): coefficient<->evaluation transforms for every committed
polynomial and the extended-domain quotient computation.

Design: **constant-geometry** radix-2 DIT NTT. Every one of the log2(n)
stages has the identical dataflow — gather the butterfly operands, one
batched field mul by the stage twiddles, add/sub, and a scatter-free inverse
permutation — so the whole transform is a single `lax.scan` whose body
compiles once, with the per-stage gather indices and twiddle tables
precomputed host-side and streamed through the scan. This keeps XLA compile
time flat in n (an unrolled formulation took minutes to compile at k=17),
while runtime stays one full-domain field mul + add/sub per stage.

Multi-chip: stages whose stride crosses the shard boundary become
all-to-all/ppermute exchanges; see zkodst_tpu/parallel/ntt_sharded.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .field import Field


def bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


# registry so the plan cache key stays hashable
_FIELDS: dict = {}


@lru_cache(maxsize=None)
def _plan(field_key, n: int, w: int):
    """Host-side constant-geometry plan.

    Returns (rev, in_idx, out_inv, tw):
      rev     (n,)            bit-reversal input permutation
      in_idx  (logn, n)       per-stage butterfly operand gather (U then V)
      out_inv (logn, n)       per-stage inverse permutation of concat(plus,minus)
      tw      (logn, n/2, L)  per-stage twiddles, Montgomery form
    """
    F = _FIELDS[field_key]
    p = F.p
    logn = n.bit_length() - 1
    assert 1 << logn == n, "domain size must be a power of two"
    assert pow(w, n, p) == 1 and (n == 1 or pow(w, n // 2, p) != 1), \
        "w must be a primitive n-th root of unity"

    in_idx = np.empty((logn, n), np.int32)
    out_inv = np.empty((logn, n), np.int32)
    tw = np.empty((logn, n // 2), dtype=object)
    k = np.arange(n // 2)
    for si, s in enumerate(range(1, logn + 1)):
        m = 1 << s
        block, j = k // (m // 2), k % (m // 2)
        iu = block * m + j
        iv = iu + m // 2
        in_idx[si, : n // 2] = iu
        in_idx[si, n // 2:] = iv
        out_inv[si, iu] = k
        out_inv[si, iv] = k + n // 2
        wm = pow(w, n // m, p)
        # twiddle per pair = wm^j
        stage_tw = np.empty(n // 2, dtype=object)
        acc = [1]
        for _ in range(1, m // 2):
            acc.append(acc[-1] * wm % p)
        stage_tw[:] = [acc[int(x)] for x in j]
        tw[si] = stage_tw
    tw_limbs = F.from_ints(np.stack(list(tw)))  # (logn, n/2, L)
    # NOTE: return host numpy only — this function is lru_cached and may be
    # called inside a jit trace; caching jnp arrays would leak tracers.
    return (bit_reverse_indices(n).astype(np.int32), in_idx, out_inv,
            tw_limbs)


@partial(jax.jit, static_argnums=(0, 2))
def ntt(F: Field, a, w: int):
    """Forward NTT along axis -2.

    Args:
      F: field.
      a: (..., n, L) uint32 Montgomery limbs — coefficients, natural order.
      w: primitive n-th root of unity (Python int, normal form).

    Returns evaluations a(w^i) in natural order, shape (..., n, L).
    """
    n = a.shape[-2]
    if n == 1:
        return a
    _FIELDS[F._key] = F
    rev, in_idx, out_inv, tw = (jnp.asarray(x) for x in _plan(F._key, n, w))
    a = jnp.take(a, rev, axis=-2)

    def stage(x, args):
        idx, inv, tws = args
        g = jnp.take(x, idx, axis=-2)                  # (..., n, L)
        u, v = g[..., : n // 2, :], g[..., n // 2:, :]
        t = F.mul(v, tws)
        y = jnp.concatenate([F.add(u, t), F.sub(u, t)], axis=-2)
        return jnp.take(y, inv, axis=-2), None

    a, _ = jax.lax.scan(stage, a, (in_idx, out_inv, tw))
    return a


@partial(jax.jit, static_argnums=(0, 2))
def intt(F: Field, a, w: int):
    """Inverse NTT along axis -2 (divides by n)."""
    n = a.shape[-2]
    winv = pow(w, -1, F.p)
    out = ntt(F, a, winv)
    ninv = pow(n, -1, F.p)
    return F.mul(out, jnp.broadcast_to(jnp.asarray(F.from_int(ninv)), out.shape))


@partial(jax.jit, static_argnums=(0, 2, 3))
def coset_scale(F: Field, a, g: int, inverse: bool = False):
    """Multiply coefficient i by g^i (or g^-i): maps a(X) -> a(gX)."""
    n = a.shape[-2]
    gg = pow(g, -1, F.p) if inverse else g % F.p
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * gg % F.p
    return F.mul(a, jnp.asarray(F.from_ints(pows)))


def coset_ntt(F: Field, a, w: int, g: int):
    """Evaluate a(X) over the coset {g * w^i}."""
    return ntt(F, coset_scale(F, a, g), w)


def coset_intt(F: Field, a, w: int, g: int):
    """Recover coefficients from evaluations over the coset {g * w^i}."""
    return coset_scale(F, intt(F, a, w), g, inverse=True)
