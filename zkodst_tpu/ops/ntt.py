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

    Returns (rev, in_idx, out_inv, tw_exp, wtab):
      rev     (n,)            bit-reversal input permutation
      in_idx  (logn, n)       per-stage butterfly operand gather (U then V)
      out_inv (logn, n)       per-stage inverse permutation
      tw_exp  (logn, n/2)     per-stage twiddle EXPONENT e: twiddle = w^e
      wtab    (n/2, L)        powers-of-w table, Montgomery form
    Twiddles ship as exponent indices into one geometric table — building
    per-stage limb tables costs logn× more host big-int work and HBM."""
    F = _FIELDS[field_key]
    p = F.p
    logn = n.bit_length() - 1
    assert 1 << logn == n, "domain size must be a power of two"
    assert pow(w, n, p) == 1 and (n == 1 or pow(w, n // 2, p) != 1), \
        "w must be a primitive n-th root of unity"

    in_idx = np.empty((logn, n), np.int32)
    out_inv = np.empty((logn, n), np.int32)
    tw_exp = np.empty((logn, n // 2), np.int32)
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
        tw_exp[si] = (n // m) * j              # twiddle = w^{(n/m)·j} < w^{n/2}
    return (bit_reverse_indices(n).astype(np.int32), in_idx, out_inv,
            tw_exp)


# device-resident plan cache: plans are passed to the jitted transform as
# RUNTIME OPERANDS, never closed-over constants — the extended-domain
# twiddle table is ~320 MB and embedding it as an HLO literal blows the
# compile-request size limit (observed: axon relay HTTP 413)
_DEV_PLANS: dict = {}


def powers_table(F: Field, g: int, n: int):
    """[1, g, g², …, g^{n-1}] as (n, L) Montgomery limbs, built ON DEVICE
    by log-doubling (host builds would convert n big ints — minutes at the
    extended-domain sizes)."""
    arr = jnp.asarray(F.from_ints([1, g % F.p]))
    while arr.shape[0] < n:
        m = arr.shape[0]
        gm = jnp.broadcast_to(jnp.asarray(F.from_int(pow(g, m, F.p))),
                              arr.shape)
        arr = jnp.concatenate([arr, F.mul(arr, gm)], axis=0)
    return arr[:n]


def _tracing() -> bool:
    """True when called under a jit/vmap trace (then device arrays built
    here are tracers and must not be cached)."""
    try:
        from jax._src import core as _core

        return not _core.trace_state_clean()
    except (ImportError, AttributeError):
        # version-robust fallback: a fresh asarray is a Tracer iff tracing
        probe = jnp.asarray(0, jnp.uint32)
        return not isinstance(probe, jax.Array) or hasattr(probe, "_trace")


def _device_plan(F: Field, n: int, w: int):
    key = (F._key, n, w)
    if key not in _DEV_PLANS:
        _FIELDS[F._key] = F
        host = _plan(F._key, n, w)
        if _tracing():
            # under an outer jit: everything here would be a tracer/constant
            # of THIS trace — usable now, but must not be cached
            return (tuple(host)
                    + (powers_table(F, w, max(1, n // 2)),))
        plan = tuple(jnp.asarray(x) for x in host)
        _DEV_PLANS[key] = plan + (powers_table(F, w, max(1, n // 2)),)
    return _DEV_PLANS[key]


@partial(jax.jit, static_argnums=(0,))
def _ntt_impl(F: Field, a, rev, in_idx, out_inv, tw_exp, wtab):
    n = a.shape[-2]
    a = jnp.take(a, rev, axis=-2)

    def stage(x, args):
        idx, inv, exps = args
        g = jnp.take(x, idx, axis=-2)                  # (..., n, L)
        u, v = g[..., : n // 2, :], g[..., n // 2:, :]
        t = F.mul(v, wtab[exps])
        y = jnp.concatenate([F.add(u, t), F.sub(u, t)], axis=-2)
        return jnp.take(y, inv, axis=-2), None

    a, _ = jax.lax.scan(stage, a, (in_idx, out_inv, tw_exp))
    return a


def _pallas_ntt_wanted(n: int) -> bool:
    """Route big TPU transforms through the fused butterfly kernels
    (pallas/ntt.py); keep the scan path for CPU tests and tiny domains."""
    import os

    if os.environ.get("ZKODST_NO_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # noqa: BLE001
        return False
    return backend in ("tpu", "axon") and n >= 1024


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
    if _pallas_ntt_wanted(n):
        from ..pallas.ntt import ntt_pallas

        return ntt_pallas(F, a, w)
    rev, in_idx, out_inv, tw_exp, wtab = _device_plan(F, n, w)
    from ..utils import compilebudget as cb

    if cb.unify(n) and not _tracing():
        # collapse every batch shape onto ONE (PAD_B, n, L) graph — a cold
        # 1-core prove otherwise compiles a distinct scan per batch size
        lead = a.shape[:-2]
        flat = a.reshape((-1, n, a.shape[-1]))
        padded, b = cb.pad_batch(flat)
        chunks = []
        for i in range(0, padded.shape[0], cb.pad_b()):
            chunks.append(_ntt_impl(F, padded[i: i + cb.pad_b()], rev,
                                    in_idx, out_inv, tw_exp, wtab))
        out = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
        return out[:b].reshape(lead + (n, a.shape[-1]))
    return _ntt_impl(F, a, rev, in_idx, out_inv, tw_exp, wtab)


def intt(F: Field, a, w: int):
    """Inverse NTT along axis -2 (divides by n)."""
    n = a.shape[-2]
    winv = pow(w, -1, F.p)
    out = ntt(F, a, winv)
    ninv = pow(n, -1, F.p)
    return F.mul(out, jnp.broadcast_to(jnp.asarray(F.from_int(ninv)),
                                       out.shape))


_POW_TABLES: dict = {}


def _pow_table(F: Field, n: int, g: int):
    key = (F._key, n, g)
    if key not in _POW_TABLES:
        tab = powers_table(F, g, n)
        if _tracing():
            return tab          # tracer: usable this trace, not cacheable
        _POW_TABLES[key] = tab
    return _POW_TABLES[key]


def coset_scale(F: Field, a, g: int, inverse: bool = False):
    """Multiply coefficient i by g^i (or g^-i): maps a(X) -> a(gX)."""
    n = a.shape[-2]
    gg = pow(g, -1, F.p) if inverse else g % F.p
    return F.mul(a, _pow_table(F, n, gg))


def coset_ntt(F: Field, a, w: int, g: int):
    """Evaluate a(X) over the coset {g * w^i}."""
    return ntt(F, coset_scale(F, a, g), w)


def coset_intt(F: Field, a, w: int, g: int):
    """Recover coefficients from evaluations over the coset {g * w^i}."""
    return coset_scale(F, intt(F, a, w), g, inverse=True)
