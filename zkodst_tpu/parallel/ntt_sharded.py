"""Multi-chip NTT: 4-step (Bailey) decomposition with one all-to-all.

The distributed-FFT component BASELINE.md config 5 calls for (SURVEY.md
§2.3 N7, §7 step 7 "choose a 4-step/Bailey NTT to localize"): the 2^k
domain is factored n = n1·n2 and laid out as a matrix so that all butterfly
stages are chip-local and the single inter-chip exchange is one tiled
`all_to_all` transpose over ICI.

Math (j = j1·n2 + j2, k = k1 + n1·k2):
  X[k1 + n1·k2] = NTT_{n2, j2→k2}( w^{j2·k1} · NTT_{n1, j1→k1}(A[j1, j2]) )
with A = a.reshape(n1, n2), inner root w^{n2}, outer root w^{n1}.

Layouts: input sharded on the j2 (column) axis — a.reshape(n1, n2) with
P(None, axis) — output C[k1, k2] sharded on the k1 (row) axis. The natural-
order result is C.T.reshape(n); `intt_sharded` inverts the whole pipeline
and hands back the input layout, so chained transforms never materialize
the transpose.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import ntt as nttmod
from ..ops.field import Field

_FIELDS: dict = {}

# jitted shard_map programs, keyed by (field, n1, n2, w, mesh, axis, kind)
# — a fresh jax.jit wrapper per call would re-TRACE the whole graph every
# time; the cache makes repeat calls (one per prover phase) free
_FN_CACHE: dict = {}


def _cached_fn(key, make):
    if key not in _FN_CACHE:
        _FN_CACHE[key] = make()
    return _FN_CACHE[key]


@lru_cache(maxsize=None)
def _twiddles(field_key, n1: int, n2: int, w: int) -> np.ndarray:
    """w^{j2·k1} as an (n1, n2, 16) Montgomery table (host, cached)."""
    F = _FIELDS[field_key]
    p = F.p
    rows = np.empty((n1, n2), dtype=object)
    for k1 in range(n1):
        wk = pow(w, k1, p)
        acc = 1
        for j2 in range(n2):
            rows[k1, j2] = acc
            acc = acc * wk % p
    return F.from_ints(rows)


def ntt_sharded(F: Field, a, w: int, mesh: Mesh, axis: str = "x",
                n1: int | None = None):
    """Forward NTT of a (n, 16) column over a 1-D mesh axis.

    Returns evaluations as the C[k1, k2] matrix flattened row-major —
    i.e. `out.reshape(n1, n2).T.reshape(n)` is the natural-order result
    (helper: :func:`to_natural`)."""
    _FIELDS[F._key] = F
    n = a.shape[0]
    ndev = mesh.shape[axis]
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    assert n1 * n2 == n and n1 % ndev == 0 and n2 % ndev == 0
    w1 = pow(w, n2, F.p)
    w2 = pow(w, n1, F.p)
    tw = jnp.asarray(_twiddles(F._key, n1, n2, w))

    def local(ab, twb):
        # ab: (n1, n2/D, 16) — inner NTT along axis 0 (size n1, local)
        x = jnp.moveaxis(ab, 0, -2)                    # (n2/D, n1, 16)
        x = nttmod.ntt(F, x, w1)
        x = jnp.moveaxis(x, -2, 0)                     # (n1, n2/D, 16)
        x = F.mul(x, twb)
        # transpose shards: (n1, n2/D) -> (n1/D, n2), one ICI all-to-all
        x = jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        # outer NTT along axis 1 (size n2, local)
        return nttmod.ntt(F, x, w2)                    # (n1/D, n2, 16)

    fn = _cached_fn(
        (F._key, n1, n2, w, mesh, axis, "fwd"),
        lambda: jax.jit(shard_map(local, mesh=mesh,
                                  in_specs=(P(None, axis), P(None, axis)),
                                  out_specs=P(axis, None))))
    c = fn(a.reshape(n1, n2, 16), tw)
    return c.reshape(n, 16)


def intt_sharded(F: Field, c, w: int, mesh: Mesh, axis: str = "x",
                 n1: int | None = None):
    """Inverse of :func:`ntt_sharded` (takes/returns the same layouts)."""
    _FIELDS[F._key] = F
    n = c.shape[0]
    ndev = mesh.shape[axis]
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    winv = pow(w, -1, F.p)
    w1 = pow(winv, n2, F.p)
    w2 = pow(winv, n1, F.p)
    tw = jnp.asarray(_twiddles(F._key, n1, n2, winv))
    ninv = jnp.asarray(F.from_int(pow(n, -1, F.p)))

    # the forward pipeline run backwards with inverse roots, then 1/n
    def local_full(cb, twb):
        x = nttmod.ntt(F, cb, w2)                      # (n1/D, n2, 16)
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=0,
                               tiled=True)             # (n1, n2/D, 16)
        x = F.mul(x, twb)
        y = jnp.moveaxis(x, 0, -2)
        y = nttmod.ntt(F, y, w1)
        y = jnp.moveaxis(y, -2, 0)
        return F.mul(y, jnp.broadcast_to(ninv, y.shape))

    fn = _cached_fn(
        (F._key, n1, n2, w, mesh, axis, "inv"),
        lambda: jax.jit(shard_map(local_full, mesh=mesh,
                                  in_specs=(P(axis, None), P(None, axis)),
                                  out_specs=P(None, axis))))
    a = fn(c.reshape(n1, n2, 16), tw)
    return a.reshape(n, 16)


def to_natural(out, n1: int) -> jnp.ndarray:
    """Reorder ntt_sharded output to natural evaluation order (host/test)."""
    n = out.shape[0]
    n2 = n // n1
    return jnp.transpose(out.reshape(n1, n2, 16), (1, 0, 2)).reshape(n, 16)


# ---------------------------------------------------------------------------
# batched, natural-order wrappers — the create_proof(mesh=...) entry points
# ---------------------------------------------------------------------------

def _factor(n: int, ndev: int, n1: int | None):
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        while n1 % ndev or (n // n1) % ndev:
            n1 <<= 1
    n2 = n // n1
    assert n1 * n2 == n and n1 % ndev == 0 and n2 % ndev == 0, (n, n1, ndev)
    return n1, n2


def ntt_sharded_nat(F: Field, a, w: int, mesh: Mesh, axis="x",
                    n1: int | None = None):
    """Batched 4-step NTT with natural-order input AND output.

    a: (..., n, 16) coefficient stacks (any leading dims). All butterfly
    stages are chip-local; the single inter-chip exchange is the tiled
    all_to_all; the final k1<->k2 transpose to natural order runs under
    GSPMD (dryrun-scale; a production pod would fuse it into the next
    consumer's layout instead)."""
    _FIELDS[F._key] = F
    shape = a.shape
    n = shape[-2]
    B = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    from .bootstrap import axis_size

    n1, n2 = _factor(n, axis_size(mesh, axis), n1)
    w1 = pow(w, n2, F.p)
    w2 = pow(w, n1, F.p)
    tw = jnp.asarray(_twiddles(F._key, n1, n2, w))

    def local(ab, twb):
        # ab: (B, n1, n2/D, 16) — inner NTT along the n1 axis (local)
        x = jnp.moveaxis(ab, 1, -2)                    # (B, n2/D, n1, 16)
        x = nttmod.ntt(F, x, w1)
        x = jnp.moveaxis(x, -2, 1)                     # (B, n1, n2/D, 16)
        x = F.mul(x, twb[None])
        x = jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                               tiled=True)             # (B, n1/D, n2, 16)
        return nttmod.ntt(F, x, w2)

    fn = _cached_fn(
        (F._key, n1, n2, w, mesh, axis, "fwd_nat"),
        lambda: jax.jit(shard_map(local, mesh=mesh,
                                  in_specs=(P(None, None, axis),
                                            P(None, axis)),
                                  out_specs=P(None, axis, None))))
    from ..utils import compilebudget as cbudget

    flat = a.reshape(B, n1, n2, 16)
    if cbudget.unify(n):
        c = cbudget.chunked_call(flat, lambda x: fn(x, tw))
    else:
        c = fn(flat, tw)                                # C[k1, k2]
    nat = jnp.transpose(c, (0, 2, 1, 3)).reshape(B, n, 16)
    return nat.reshape(shape)


def intt_sharded_nat(F: Field, x, w: int, mesh: Mesh, axis="x",
                     n1: int | None = None):
    """Inverse of :func:`ntt_sharded_nat` (natural order in and out)."""
    _FIELDS[F._key] = F
    shape = x.shape
    n = shape[-2]
    B = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    from .bootstrap import axis_size

    n1, n2 = _factor(n, axis_size(mesh, axis), n1)
    winv = pow(w, -1, F.p)
    w1 = pow(winv, n2, F.p)
    w2 = pow(winv, n1, F.p)
    tw = jnp.asarray(_twiddles(F._key, n1, n2, winv))
    ninv = jnp.asarray(F.from_int(pow(n, -1, F.p)))

    def local(cb, twb):
        # cb: (B, n1/D, n2, 16) — the forward pipeline run backwards
        y = nttmod.ntt(F, cb, w2)
        y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=1,
                               tiled=True)             # (B, n1, n2/D, 16)
        y = F.mul(y, twb[None])
        y = jnp.moveaxis(y, 1, -2)
        y = nttmod.ntt(F, y, w1)
        y = jnp.moveaxis(y, -2, 1)
        return F.mul(y, jnp.broadcast_to(ninv, y.shape))

    # natural (..., n) -> C[k1, k2]: f = k1 + n1·k2 ⇒ M[k2][k1] transpose
    c = jnp.transpose(x.reshape(B, n2, n1, 16), (0, 2, 1, 3))
    fn = _cached_fn(
        (F._key, n1, n2, w, mesh, axis, "inv_nat"),
        lambda: jax.jit(shard_map(local, mesh=mesh,
                                  in_specs=(P(None, axis, None),
                                            P(None, axis)),
                                  out_specs=P(None, None, axis))))
    from ..utils import compilebudget as cbudget

    if cbudget.unify(n):
        ab = cbudget.chunked_call(c, lambda x: fn(x, tw))
    else:
        ab = fn(c, tw)                                 # (B, n1, n2, 16)
    return ab.reshape(shape)
