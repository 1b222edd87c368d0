"""SHPLONK multiopen (BDFG20) — KZG batch opening at arbitrary point sets.

The `ProverSHPLONK`/`VerifierSHPLONK` equivalent
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:64-101; SURVEY.md
§2.3 N11): one pair of G1 witness points opens every (poly, points, evals)
claim of the proof.

Protocol (claims (f_i, S_i, r_i), T = ∪S_i, r_i = interpolant of the claimed
evals over S_i):

  y ← FS                     h(X)  = Σ y^i (f_i(X) − r_i(X)) / Z_{S_i}(X)
  W  = [h]₁ → transcript
  z ← FS                     L(X)  = Σ y^i Z_{T∖S_i}(z)(f_i(X) − r_i(z))
                                     − Z_T(z)·h(X)          (L(z) = 0)
                             h'(X) = L(X)/(X − z)
  W' = [h']₁ → transcript
  check:  e(L_com + z·W', G2) == e(W', [τ]G2)

TPU-first: both divisions run in **evaluation form** over H (batched field
inversions + pointwise ops — no sequential synthetic division), then one
iNTT + MSM per witness point. Host work is O(#claims · |S_i|²) scalars.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pycurve
from ..ops.field import FR as DFR
from ..ops.pyfield import FR
from . import srs
from .domain import Domain


@dataclass
class Claim:
    """One opening claim. evals_dev is prover-only ((n,16) eval form on H);
    coeffs_dev is the coefficient form, carried only by the IPA backend
    (proof/pcs.py) whose openings run over the monomial basis."""

    points: Tuple[int, ...]
    evals: Tuple[int, ...]
    evals_dev: object = None        # prover (KZG/SHPLONK path)
    coeffs_dev: object = None       # prover (IPA path)
    commitment: object = None       # verifier (affine int tuple)


def _interp(points: Sequence[int], evals: Sequence[int]) -> List[int]:
    """Lagrange interpolation -> coefficient list (host, tiny sets)."""
    p = FR.p
    m = len(points)
    coeffs = [0] * m
    for j in range(m):
        # basis poly ∏_{k≠j} (X − x_k) / (x_j − x_k)
        num = [1]
        den = 1
        for kk in range(m):
            if kk == j:
                continue
            num = _polymul(num, [(-points[kk]) % p, 1])
            den = den * (points[j] - points[kk]) % p
        scale = evals[j] * pow(den, -1, p) % p
        for t in range(len(num)):
            coeffs[t] = (coeffs[t] + scale * num[t]) % p
    return coeffs


def _polymul(a: List[int], b: List[int]) -> List[int]:
    p = FR.p
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, yv in enumerate(b):
            out[i + j] = (out[i + j] + x * yv) % p
    return out


def _poly_eval(coeffs: List[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FR.p
    return acc


@lru_cache(maxsize=4)
def _roots_table(k: int):
    """ω^j for j < n, as a device-resident (n, 16) table."""
    from ..ops.ntt import powers_table

    dom = Domain(k)
    return powers_table(DFR, dom.omega, dom.n)


def _eval_on_h(coeffs: List[int], roots) -> jnp.ndarray:
    """Evaluate a tiny host poly on all of H (device Horner)."""
    n = roots.shape[0]
    acc = jnp.broadcast_to(jnp.asarray(DFR.from_int(0)), (n, 16))
    for c in reversed(coeffs):
        acc = DFR.mul(acc, roots)
        acc = DFR.add(acc, jnp.broadcast_to(jnp.asarray(DFR.from_int(c)),
                                            (n, 16)))
    return acc


def _zs_on_h(points: Sequence[int], roots) -> jnp.ndarray:
    """Z_S(X) = ∏(X − s) evaluated on H (device)."""
    n = roots.shape[0]
    acc = jnp.broadcast_to(jnp.asarray(DFR.ONE), (n, 16))
    for s in points:
        sm = jnp.broadcast_to(jnp.asarray(DFR.from_int(s)), (n, 16))
        acc = DFR.mul(acc, DFR.sub(roots, sm))
    return acc


def _sum_axis0(x):
    """Field sum over axis 0 of (C, n, 16) by pairwise halving."""
    c = x.shape[0]
    while c > 1:
        if c % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            c += 1
        x = DFR.add(x[0::2], x[1::2])
        c //= 2
    return x[0]


@jax.jit
def _h_pass(evs, rcoef, plimbs, pmask, ypows, roots):
    """h(X) eval form: Σ y^i (f_i − r_i)/Z_{S_i} — ONE dispatch.

    evs (C,n,16) claim eval forms; rcoef (C,S,16) interpolant coeffs (zero-
    padded); plimbs (C,S,16) + pmask (C,S) the padded point sets; ypows
    (C,16) the y^i weights."""
    C, n, _ = evs.shape
    S = rcoef.shape[1]
    acc = jnp.zeros_like(evs)
    for j in range(S - 1, -1, -1):                 # Horner; pad coeffs = 0
        acc = DFR.mul(acc, jnp.broadcast_to(roots[None], evs.shape))
        acc = DFR.add(acc, jnp.broadcast_to(rcoef[:, j, None, :],
                                            evs.shape))
    num = DFR.sub(evs, acc)
    one = jnp.broadcast_to(jnp.asarray(DFR.ONE), evs.shape)
    zs = one
    for j in range(S):
        diff = DFR.sub(jnp.broadcast_to(roots[None], evs.shape),
                       jnp.broadcast_to(plimbs[:, j, None, :], evs.shape))
        diff = jnp.where(pmask[:, j, None, None], diff, one)
        zs = DFR.mul(zs, diff)
    zinv = DFR.inv_batch(zs.reshape(C * n, 16)).reshape(C, n, 16)
    term = DFR.mul(DFR.mul(num, zinv),
                   jnp.broadcast_to(ypows[:, None, :], evs.shape))
    return _sum_axis0(term)


@jax.jit
def _l_pass(evs, cks, constk, ztzk, h_ev, roots, zk):
    """h'(X) eval form: (Σ c_i f_i − const − Z_T(z)h) / (X−z) — ONE dispatch."""
    term = DFR.mul(jnp.broadcast_to(cks[:, None, :], evs.shape), evs)
    l_ev = _sum_axis0(term)
    l_ev = DFR.sub(l_ev, jnp.broadcast_to(constk, l_ev.shape))
    l_ev = DFR.sub(l_ev, DFR.mul(
        jnp.broadcast_to(ztzk, l_ev.shape), h_ev))
    zm = jnp.broadcast_to(zk, l_ev.shape)
    return DFR.mul(l_ev, DFR.inv_batch(DFR.sub(roots, zm)))


def open_claims(params: srs.ParamsKZG, dom: Domain, claims: List[Claim],
                tw) -> None:
    """Prover: writes W, W' to the transcript (two jitted device passes +
    two commitments)."""
    p = FR.p
    n = dom.n
    roots = _roots_table(dom.k)
    C = len(claims)
    S = max(len(cl.points) for cl in claims)

    y = tw.squeeze_challenge()

    evs = jnp.stack([jnp.asarray(cl.evals_dev) for cl in claims])
    rs = [_interp(cl.points, cl.evals) for cl in claims]
    rcoef = DFR.from_ints(
        [[r[j] if j < len(r) else 0 for j in range(S)] for r in rs])
    plimbs = DFR.from_ints(
        [[cl.points[j] if j < len(cl.points) else 0 for j in range(S)]
         for cl in claims])
    pmask = np.asarray([[j < len(cl.points) for j in range(S)]
                        for cl in claims])
    ypows_i = [1] * C
    for i in range(1, C):
        ypows_i[i] = ypows_i[i - 1] * y % p
    ypows = DFR.from_ints(ypows_i)

    h_ev = _h_pass(evs, jnp.asarray(rcoef), jnp.asarray(plimbs),
                   jnp.asarray(pmask), jnp.asarray(ypows), roots)
    w_pt = srs.to_affine(srs.commit_coeff(params, dom.intt(h_ev)))
    tw.write_point(w_pt)

    z = tw.squeeze_challenge()
    t_all = sorted({pt for cl in claims for pt in cl.points})
    zt_z = 1
    for s in t_all:
        zt_z = zt_z * (z - s) % p
    cs, const = [], 0
    for i, (cl, r) in enumerate(zip(claims, rs)):
        zts = 1
        for s in t_all:
            if s not in cl.points:
                zts = zts * (z - s) % p
        c = ypows_i[i] * zts % p
        cs.append(c)
        const = (const + c * _poly_eval(r, z)) % p

    hp_ev = _l_pass(evs, jnp.asarray(DFR.from_ints(cs)),
                    jnp.asarray(DFR.from_int(const)),
                    jnp.asarray(DFR.from_int(zt_z)), h_ev, roots,
                    jnp.asarray(DFR.from_int(z)))
    wp_pt = srs.to_affine(srs.commit_coeff(params, dom.intt(hp_ev)))
    tw.write_point(wp_pt)


def verify_claims(params: srs.ParamsKZG, dom: Domain, claims: List[Claim],
                  tr) -> bool:
    """Verifier: reads W, W', runs the pairing check (native C++ core when
    available, pure Python otherwise — zkodst_tpu/native.py)."""
    from .. import native as pairing

    p = FR.p
    y = tr.squeeze_challenge()
    w_pt = tr.read_point()
    z = tr.squeeze_challenge()
    wp_pt = tr.read_point()

    t_all = sorted({pt for cl in claims for pt in cl.points})
    zt_z = 1
    for s in t_all:
        zt_z = zt_z * (z - s) % p

    # L_com = Σ y^i Z_{T∖S_i}(z)·C_i − [const]·G − Z_T(z)·W  (+ z·W'),
    # combined as ONE host MSM (native C++ core when available)
    g1 = pycurve.G1
    pts, scs = [], []
    const = 0
    ypow = 1
    for cl in claims:
        zts = 1
        for s in t_all:
            if s not in cl.points:
                zts = zts * (z - s) % p
        c = ypow * zts % p
        pts.append(cl.commitment)
        scs.append(c)
        r = _interp(cl.points, cl.evals)
        const = (const + c * _poly_eval(r, z)) % p
        ypow = ypow * y % p
    pts += [pycurve.G1_GEN, w_pt, wp_pt]
    scs += [(-const) % p, (-zt_z) % p, z]
    lhs = pairing.g1_msm(pts, scs)
    # e(L_com + z·W', G2) == e(W', [τ]G2)
    return pairing.pairing_check(
        [(lhs, params.g2), (g1.neg(wp_pt), params.s_g2)])
