"""KZG structured reference string (SRS) + polynomial commitments.

The `ParamsKZG::<Bn256>::setup` equivalent
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:49; SURVEY.md
§2.3 N11): a *testing* SRS from a seeded τ, with both the monomial basis
[τ^i]G (for coefficient-form commits: quotient chunks, SHPLONK witnesses)
and the Lagrange basis [L_i(τ)]G (for direct eval-form commits: advice,
lookup, permutation columns — skips an iNTT per commitment).

TPU-first: the 2·n point tables are produced by ONE batched 256-step
double-and-add over all lanes (ops.curve.scalar_mul), with the scalar
tables (τ^i and L_i(τ)) computed host-side via a batched-inversion pass.
Commitments are Pippenger MSMs (ops.msm). Persisted to disk keyed by k
(SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve, msm
from ..ops import pycurve
from ..ops.field import FR as DFR
from ..ops.pyfield import FR
from .domain import Domain


@dataclass
class ParamsKZG:
    k: int
    g1: np.ndarray             # (n, 3, 16) monomial-basis points [τ^i]G
    g1_lagrange: np.ndarray    # (n, 3, 16) Lagrange-basis points [L_i(τ)]G
    g2: Tuple                  # G2 generator (affine Fq2 ints)
    s_g2: Tuple                # [τ]G2

    @property
    def n(self) -> int:
        return 1 << self.k


def _batch_inv(vals, p):
    pref = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % p
    inv = pow(pref[-1], -1, p)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * inv % p
        inv = inv * vals[i] % p
    return out


@jax.jit
def _fixed_base_msm(tbl, digits):
    """acc_i = Σ_w tbl[w][digits[w, i]] — per-lane fixed-base sums.

    tbl: (W, 16, 3, 16) window point tables; digits: (W, n)."""
    n = digits.shape[1]
    acc0 = jnp.broadcast_to(curve.identity(), (n, 3, 16))

    def body(acc, wd):
        trow, drow = wd
        return curve.add(acc, trow[drow]), None

    acc, _ = jax.lax.scan(body, acc0, (tbl, digits))
    return acc


def setup(k: int, seed: int = 0) -> ParamsKZG:
    """Deterministic testing SRS (the reference seeds its RNG the same way
    for reproducible transcripts, blake2f_circuit_bench.rs:41-44)."""
    import random

    p = FR.p
    n = 1 << k
    rng = random.Random(("zkodst-srs", seed, k).__repr__())
    tau = rng.randrange(1, p)

    # scalar tables (host): τ^i, and L_i(τ) = ω^i (τ^n − 1) / (n (τ − ω^i))
    dom = Domain(k)
    w = dom.omega
    taupow = [1] * n
    for i in range(1, n):
        taupow[i] = taupow[i - 1] * tau % p
    zh = (pow(tau, n, p) - 1) % p
    wpow = [1] * n
    for i in range(1, n):
        wpow[i] = wpow[i - 1] * w % p
    dens = [n * (tau - wpow[i]) % p for i in range(n)]
    dinv = _batch_inv(dens, p)
    lag = [wpow[i] * zh % p * dinv[i] % p for i in range(n)]

    # device: fixed-base windowed ladder. Host precomputes the tiny
    # table[w][d] = d·2^{4w}·G (64×16 points); the device scan body is one
    # gather + one complete add — far cheaper to compile AND 4× fewer adds
    # than a 256-step double-and-add.
    C, W = 4, 64
    tbl_aff = []
    pw = pycurve.G1_GEN
    for w in range(W):
        row = [None]
        for d in range(1, 1 << C):
            row.append(pycurve.G1.add(row[-1], pw))
        tbl_aff.append(row)
        for _ in range(C):
            pw = pycurve.G1.add(pw, pw)
    tbl = np.stack([curve.from_affine_ints(r) for r in tbl_aff])  # (W,16,3,16)

    def _pmul(scalars):
        digits = np.zeros((W, n), np.int32)
        for i, s in enumerate(scalars):
            for w in range(W):
                digits[w, i] = (s >> (C * w)) & ((1 << C) - 1)
        return np.asarray(_fixed_base_msm(jnp.asarray(tbl),
                                          jnp.asarray(digits)))

    g1 = _pmul(taupow)
    g1_lagrange = _pmul(lag)
    s_g2 = pycurve.G2.mul(pycurve.G2_GEN, tau)
    return ParamsKZG(k=k, g1=g1, g1_lagrange=g1_lagrange,
                     g2=pycurve.G2_GEN, s_g2=s_g2)


# Chunk very large MSMs and tree-add the partials. (A 2^17 MSM used to
# fault the TPU worker via the jnp segmented-scan path; the packed Pallas
# path handles 2^17 directly, so the chunk size only bounds transients.)
MSM_CHUNK = 1 << 17


def _msm_chunked(points, scalars_mont, c: int):
    n = scalars_mont.shape[0]
    if n <= MSM_CHUNK:
        return msm.msm_mont_aot(points, scalars_mont, c)
    acc = None
    for i in range(0, n, MSM_CHUNK):
        part = msm.msm_mont_aot(points[i: i + MSM_CHUNK],
                                scalars_mont[i: i + MSM_CHUNK], c)
        acc = part if acc is None else curve.add(acc, part)
    return acc


def commit_lagrange(params: ParamsKZG, evals_mont, c: int = 13):
    """Commit a polynomial given in evaluation (Lagrange) form.

    evals_mont: (n, 16) uint32 Fr Montgomery limbs. Returns a device-side
    projective point (3, 16)."""
    from ..utils import compilebudget as cb

    if cb.unify(evals_mont.shape[0]):
        padded, _ = cb.pad_batch(evals_mont[None])     # reuse the batched graph
        return msm.msm_small_many_mont(params.g1_lagrange, padded)[0]
    return _msm_chunked(params.g1_lagrange, evals_mont, c)


def commit_lagrange_many(params: ParamsKZG, evals_batch, c: int = 13,
                         mesh=None, mesh_axis: str = "x",
                         body_bits: int | None = None,
                         tail_rows: int = 0):
    """Commit B eval-form polynomials in one batched dispatch.

    evals_batch: (B, n, 16) Montgomery limbs -> list of B affine points.
    Chunked the same way as commit_lagrange (2^17 MSMs fault the TPU).
    With `mesh`, the point axis is sharded over `mesh_axis` and each device
    runs the Pippenger on its shard (parallel/msm_sharded.py) — the
    multi-chip commit path of BASELINE.md config 5.

    body_bits/tail_rows: small-scalar split. When the first n−tail_rows
    rows are bounded by 2^body_bits (witness columns are u64 values), the
    body MSM runs only ceil(body_bits/c) windows — 5 instead of 20 for the
    advice commit — and the tail_rows full-width rows (blinding) go
    through a tiny separate full-width MSM, EC-added back on."""
    import jax.numpy as jnp

    from ..utils import compilebudget as cb

    if mesh is not None:
        from ..parallel.msm_sharded import msm_many_sharded_mont

        if cb.unify(evals_batch.shape[1]):
            accs = cb.chunked_call(
                evals_batch,
                lambda eb: msm_many_sharded_mont(params.g1_lagrange, eb,
                                                 mesh, mesh_axis, c,
                                                 small=True))
        else:
            accs = msm_many_sharded_mont(params.g1_lagrange, evals_batch,
                                         mesh, mesh_axis, c)
        return curve.to_affine_ints(np.asarray(accs))
    n = evals_batch.shape[1]
    if cb.unify(n):
        # small domains: ONE padded double-and-add MSM graph for every
        # commit phase (msm_small — the Pippenger graph costs minutes of
        # XLA:CPU compile; throughput is irrelevant at these sizes)
        accs = cb.chunked_call(
            evals_batch,
            lambda eb: msm.msm_small_many_mont(params.g1_lagrange, eb))
        return curve.to_affine_ints(np.asarray(accs))
    if body_bits is not None:
        body = evals_batch
        if tail_rows:
            body = body.at[:, n - tail_rows:].set(0)
        accs = None
        for i in range(0, n, MSM_CHUNK):
            part = msm.msm_many_mont_aot(
                params.g1_lagrange[i: i + MSM_CHUNK],
                body[:, i: i + MSM_CHUNK], c, scalar_bits=body_bits)
            accs = part if accs is None else curve.add(accs, part)
        if tail_rows:
            tail = msm.msm_many_mont_aot(
                params.g1_lagrange[n - tail_rows:],
                evals_batch[:, n - tail_rows:], c)
            accs = curve.add(accs, tail)
        return curve.to_affine_ints(np.asarray(accs))
    accs = None
    for i in range(0, n, MSM_CHUNK):
        part = msm.msm_many_mont_aot(
            params.g1_lagrange[i: i + MSM_CHUNK],
            evals_batch[:, i: i + MSM_CHUNK], c)
        accs = part if accs is None else curve.add(accs, part)
    return curve.to_affine_ints(np.asarray(accs))


def commit_coeff(params: ParamsKZG, coeffs_mont, c: int = 13):
    """Commit a polynomial in coefficient form (may be shorter than n)."""
    from ..utils import compilebudget as cb

    m = coeffs_mont.shape[0]
    if cb.unify(m):
        padded, _ = cb.pad_batch(coeffs_mont[None])
        return msm.msm_small_many_mont(params.g1[:m], padded)[0]
    return _msm_chunked(params.g1[:m], coeffs_mont, c)


def commit_coeff_many(params: ParamsKZG, coeffs_batch, c: int = 13,
                      mesh=None, mesh_axis: str = "x"):
    """Batched coefficient-form commits -> list of affine points."""
    from ..utils import compilebudget as cb

    m = coeffs_batch.shape[1]
    if mesh is not None:
        from ..parallel.msm_sharded import msm_many_sharded_mont

        if cb.unify(m):
            accs = cb.chunked_call(
                coeffs_batch,
                lambda cbt: msm_many_sharded_mont(params.g1[:m], cbt,
                                                  mesh, mesh_axis, c,
                                                  small=True))
        else:
            accs = msm_many_sharded_mont(params.g1[:m], coeffs_batch,
                                         mesh, mesh_axis, c)
        return curve.to_affine_ints(np.asarray(accs))
    if cb.unify(m):
        accs = cb.chunked_call(
            coeffs_batch,
            lambda cbt: msm.msm_small_many_mont(params.g1[:m], cbt))
        return curve.to_affine_ints(np.asarray(accs))
    accs = None
    for i in range(0, m, MSM_CHUNK):
        part = msm.msm_many_mont_aot(
            params.g1[i: i + MSM_CHUNK],
            coeffs_batch[:, i: i + MSM_CHUNK], c)
        accs = part if accs is None else curve.add(accs, part)
    return curve.to_affine_ints(np.asarray(accs))


def to_affine(point) -> Optional[Tuple[int, int]]:
    """Device projective point -> host affine int tuple (None = identity)."""
    return curve.to_affine_ints(np.asarray(point)[None])[0]


# ---------------------------------------------------------------------------
# disk persistence (SURVEY.md §5.4 — params cached like the reference's
# benches/blake2f.rs:83-97 sha256_params file)
# ---------------------------------------------------------------------------

def _ints_to_u32(vals, nlimbs: int = 8) -> np.ndarray:
    """Nested int tuples -> uint32 limb array, last axis = nlimbs (LE).

    Plain-array persistence: committed .npz caches must never need
    allow_pickle (a deserialization trust surface — ADVICE r3)."""
    arr = np.asarray(vals, dtype=object)
    out = np.zeros(arr.shape + (nlimbs,), np.uint32)
    for idx in np.ndindex(arr.shape):
        v = int(arr[idx])
        for j in range(nlimbs):
            out[idx + (j,)] = (v >> (32 * j)) & 0xFFFFFFFF
    return out


def _u32_to_ints(arr: np.ndarray):
    """Inverse of _ints_to_u32 (returns nested tuples of ints)."""
    if arr.ndim == 1:
        return sum(int(x) << (32 * j) for j, x in enumerate(arr))
    return tuple(_u32_to_ints(a) for a in arr)


def save(params: ParamsKZG, path: str) -> None:
    np.savez_compressed(
        path, k=params.k, g1=params.g1, g1_lagrange=params.g1_lagrange,
        g2_u32=_ints_to_u32(params.g2), s_g2_u32=_ints_to_u32(params.s_g2))


def load(path: str) -> ParamsKZG:
    z = np.load(path, allow_pickle=False)
    return ParamsKZG(k=int(z["k"]), g1=z["g1"],
                     g1_lagrange=z["g1_lagrange"],
                     g2=_u32_to_ints(z["g2_u32"]),
                     s_g2=_u32_to_ints(z["s_g2_u32"]))


def get_or_create(k: int, cache_dir: str = ".zkodst_cache",
                  seed: int = 0) -> ParamsKZG:
    os.makedirs(cache_dir, exist_ok=True)
    sfx = f"_s{seed}" if seed else ""
    path = os.path.join(cache_dir, f"srs_bn254_k{k}{sfx}.npz")
    if os.path.exists(path):
        try:
            return load(path)
        except (KeyError, ValueError, OSError) as ex:
            # pre-npz-format-change cache file (e.g. pickled g2 under the
            # old key names): regenerate and overwrite instead of
            # crashing on KeyError (ADVICE r4)
            print(f"# stale SRS cache {path} ({type(ex).__name__}): "
                  "regenerating", flush=True)
    params = setup(k, seed=seed)
    save(params, path)
    return params
