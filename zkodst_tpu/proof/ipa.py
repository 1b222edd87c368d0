"""IPA (inner-product argument) polynomial commitment — the reference's
second commitment scheme.

The zcash-halo2 backend the reference's criterion bench targets is IPA
over Pasta (`Params<EqAffine>`, /root/reference/blake2f-circuit/benches/
blake2f.rs:83-151; SURVEY.md §1 L0, §2.3 N11). This is the TPU-native
equivalent of that *capability*: a transparent (no trusted setup)
Pedersen-vector-commitment PCS with a log-size Bulletproofs-style opening
argument, built on the same BN254 G1 / Pallas MSM machinery as the KZG
path so both schemes share every hot kernel. The backend is
curve-parameterized (`_CurveCfg`): the default "bn254" shares the KZG
kernels; "pasta" runs the reference's ACTUAL L0 curve (pasta_curves
pallas — generators, scalar field VESTA_BASE, point codec) through the
generic device ops at toy scale (tests/test_ipa_pasta.py). Remaining
divergence from halo2 0.3's `poly/commitment` (docs/FORMAT.md):

* Fold/transcript conventions are this repo's own (pinned by tests), not
  byte-compatible with halo2's `commit_ipa`/`OpeningProof` layout.

Protocol (coefficient form; b = (1, x, x², …) so verifier folding of b
has a closed form):

  commit(a, r)        P_a = ⟨a, G⟩ + r·H
  open at x, v=a(x):  P   = P_a + v·U   maintains the invariant
                      P_j = ⟨a_j, G_j⟩ + ⟨a_j, b_j⟩·U + ρ_j·H
  per round j:        L_j = ⟨a_lo, G_hi⟩ + ⟨a_lo, b_hi⟩·U + l_j·H
                      R_j = ⟨a_hi, G_lo⟩ + ⟨a_hi, b_lo⟩·U + m_j·H
                      u_j ← FS;  a ← a_lo + u_j·a_hi
                      b ← b_lo + u_j⁻¹·b_hi;  G ← G_lo + u_j⁻¹·G_hi
                      ρ ← ρ + u_j⁻¹·l_j + u_j·m_j
  final:              send a₀, ρ_f;  verifier checks
                      a₀·G₀ + (a₀·b₀)·U + ρ_f·H
                        == P + Σ_j (u_j⁻¹·L_j + u_j·R_j)
  where G₀ = ⟨s, G⟩ (one n-point MSM), s_i = ∏_{j: bit_{k-j}(i)=1} u_j⁻¹,
  and b₀ = ∏_j (1 + u_j⁻¹ x^{n/2^j}) (closed form — b is geometric).

TPU-first: scalar folds are batched field ops, L/R are the shared
Pippenger (ops/msm.py, chained-scan path included), and the G-vector fold
is a 254-step shared-scalar double-and-add under `lax.scan` over all
lanes at once. Generators are derived transparently by try-and-increment
hash-to-curve (BN254 G1 has cofactor 1, so every curve point is in the
prime-order group); params are disk-cached like the KZG SRS
(SURVEY.md §5.4).
"""

from __future__ import annotations

import hashlib
import os
import secrets
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve, msm, pycurve
from ..ops.field import FR as DFR, Field
from ..ops.pyfield import FQ as PFQ
from ..ops.pyfield import FR as PFR
from ..ops.pyfield import PALLAS_BASE, VESTA_BASE, PF

# device scalar field of the Pasta "pallas" curve (points over
# PALLAS_BASE, scalars in VESTA_BASE — pasta_curves conventions)
PASTA_FR = Field(VESTA_BASE, "pasta_fr")
PASTA_FP_HOST = PF(PALLAS_BASE, "pallas_base")

L16 = 16           # limbs per field element (ops/field.py layout)


@dataclass(frozen=True)
class _CurveCfg:
    """Per-curve plumbing for the IPA backend (SURVEY.md §1 L0: the
    reference's zcash-halo2 path is Pasta; BN254 shares the KZG
    kernels)."""

    name: str
    dev: object          # ops.curve.CurveOps
    SF: object           # device scalar field (ops.field.Field)
    sp: int              # host scalar modulus
    pg: object           # host group (ops.pycurve.Group)
    base_pf: object      # host base field (hash-to-curve)
    b: int               # curve constant


def _cfg(params) -> "_CurveCfg":
    return _CFGS[getattr(params, "curve", "bn254")]


def _msm_mont_cfg(cfg: "_CurveCfg", points_dev, mont_scalars):
    """⟨scalars, points⟩ with Montgomery-form scalars, per curve.

    BN254 rides the Pippenger + Pallas kernels (ops/msm.py) at large n
    and the small-graph double-and-add (msm.msm_small) below the
    compile-budget threshold; other curves use the generic batched
    double-and-add + pairwise fold — fine at the toy sizes the
    non-default curves run at."""
    if cfg.name == "bn254":
        from ..utils import compilebudget as cb

        if cb.unify(mont_scalars.shape[0]):
            return msm.msm_small_many_mont(points_dev,
                                           mont_scalars[None])[0]
        return msm.msm_mont_aot(points_dev, mont_scalars, 13)
    one_raw = jnp.zeros_like(mont_scalars).at[..., 0].set(1)
    normal = cfg.SF.mul(mont_scalars, one_raw)
    prods = cfg.dev.scalar_mul(points_dev, normal)       # (N, 3, 16)
    while prods.shape[0] > 1:
        m = prods.shape[0]
        if m % 2:
            prods = jnp.concatenate([prods, cfg.dev.identity((1,))],
                                    axis=0)
        prods = cfg.dev.add(prods[0::2], prods[1::2])
    return prods[0]


_CFGS = {
    "bn254": _CurveCfg("bn254", curve.BN254, DFR, PFR.p, pycurve.G1,
                       PFQ, 3),
    "pasta": _CurveCfg("pasta", curve.PASTA, PASTA_FR, VESTA_BASE,
                       pycurve.PASTA_G1, PASTA_FP_HOST, 5),
}


@dataclass
class ParamsIPA:
    k: int
    g: np.ndarray            # (n, 3, 16) generator vector (Montgomery limbs)
    h: Tuple[int, int]       # blinding base (affine ints)
    u: Tuple[int, int]       # inner-product base (affine ints)
    curve: str = "bn254"     # "bn254" (shared kernels) or "pasta" (L0)

    @property
    def n(self) -> int:
        return 1 << self.k


def _hash_to_curve(tag: bytes, i: int, pf=PFQ, b: int = 3
                   ) -> Tuple[int, int]:
    """Try-and-increment: x from a hash, y the canonical (even) root.
    Sound for cofactor-1 curves (BN254 G1 and both Pasta curves): every
    curve point is in the prime-order group."""
    p = pf.p
    ctr = 0
    while True:
        d = hashlib.blake2b(tag + i.to_bytes(8, "little")
                            + ctr.to_bytes(4, "little"),
                            digest_size=32).digest()
        x = int.from_bytes(d, "little") % p
        rhs = (x * x % p * x + b) % p
        y = pf.sqrt(rhs)
        if y is not None:
            if y & 1:
                y = p - y
            return (x, y)
        ctr += 1


def setup(k: int, cache_dir: Optional[str] = None,
          curve_name: str = "bn254") -> ParamsIPA:
    """Transparent setup: n+2 hash-derived generators, disk-cached by
    (curve, k)."""
    cfg = _CFGS[curve_name]
    path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"ipa_{curve_name}_k{k}.npz")
        if os.path.exists(path):
            d = np.load(path)

            def _pt(key):
                raw = d[key].tobytes()
                return (int.from_bytes(raw[:32], "little"),
                        int.from_bytes(raw[32:], "little"))

            return ParamsIPA(k=k, g=d["g"], h=_pt("h"), u=_pt("u"),
                             curve=curve_name)
    n = 1 << k
    tag = b"zkodst-ipa-g" if curve_name == "bn254"         else b"zkodst-ipa-pasta-g"
    pts = [_hash_to_curve(tag, i, cfg.base_pf, cfg.b) for i in range(n)]
    g = cfg.dev.from_affine_ints(pts)
    h = _hash_to_curve(tag[:-1] + b"h", 0, cfg.base_pf, cfg.b)
    u = _hash_to_curve(tag[:-1] + b"u", 0, cfg.base_pf, cfg.b)
    params = ParamsIPA(k=k, g=g, h=h, u=u, curve=curve_name)
    if path:
        def _enc(pt):
            return np.frombuffer(pt[0].to_bytes(32, "little")
                                 + pt[1].to_bytes(32, "little"), np.uint8)

        np.savez(path, g=g, h=_enc(h), u=_enc(u))
    return params


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def _rand_scalar(rng=None, p: int = PFR.p) -> int:
    return (rng.randrange(p) if rng is not None
            else secrets.randbelow(p))


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnums=0)
def _scale_points(g, pts, kbits):
    """Shared-scalar point multiply: (m,3,16) × one 254-bit scalar.

    kbits: (254,) uint32 bits LSB-first (traced — one compile per shape).
    Double-and-add over all lanes at once; `curve.add` is complete, so no
    branch cases."""
    ident = jnp.broadcast_to(g.identity(), pts.shape)

    def body(st, bit):
        acc, base = st
        nacc = jnp.where(bit > 0, g._add_impl(acc, base), acc)
        return (nacc, g._add_impl(base, base)), None

    (acc, _), _ = jax.lax.scan(body, (ident, pts), kbits)
    return acc


def _bits(v: int, nbits: int = 254) -> jnp.ndarray:
    """LSB-first bit vector (255 bits for the Pasta scalar field)."""
    return jnp.asarray([(v >> i) & 1 for i in range(nbits)], jnp.uint32)


@partial(jax.jit, static_argnums=0)
def _ip(F, a, b):
    """⟨a, b⟩ over (m, 16) Montgomery vectors -> (16,)."""
    prod = F.mul(a, b)
    m = prod.shape[0]
    while m > 1:
        if m % 2:
            prod = jnp.concatenate(
                [prod, jnp.zeros((1, 16), jnp.uint32)], axis=0)
            m += 1
        prod = F.add(prod[0::2], prod[1::2])
        m //= 2
    return prod[0]


@partial(jax.jit, static_argnums=0)
def _fold_scalars(F, v, uk):
    """v_lo + u·v_hi for (m, 16) Montgomery v (uk: (16,))."""
    m = v.shape[0] // 2
    return F.add(v[:m], F.mul(jnp.broadcast_to(uk, (m, 16)), v[m:]))


def _powers_dev(x: int, n: int, F=DFR, p: int = PFR.p):
    arr = jnp.asarray(F.from_ints([1, x % p]))
    while arr.shape[0] < n:
        m = arr.shape[0]
        xm = jnp.broadcast_to(jnp.asarray(F.from_int(pow(x, m, p))),
                              arr.shape)
        arr = jnp.concatenate([arr, F.mul(arr, xm)], axis=0)
    return arr[:n]


# ---------------------------------------------------------------------------
# commit / open / verify (single polynomial, single point)
# ---------------------------------------------------------------------------

def commit(params: ParamsIPA, coeffs_mont, blind: int):
    """P_a = ⟨a, G⟩ + blind·H -> affine ints (host)."""
    cfg = _cfg(params)
    m = coeffs_mont.shape[0]
    acc = _msm_mont_cfg(cfg, jnp.asarray(params.g[:m]), coeffs_mont)
    base = cfg.dev.to_affine_ints(np.asarray(acc)[None])[0]
    return cfg.pg.add(base, cfg.pg.mul(params.h, blind))


def _open_poly_fixed_shape(params: ParamsIPA, cfg: _CurveCfg, a,
                           blind: int, x: int, tw, rng) -> None:
    """The k-round fold with CONSTANT-SHAPE device work (BN254, big n).

    The direct formulation (below) folds the generator vector every round
    (a 254-step shared-scalar ladder over the surviving lanes) and issues
    the L/R inner products as 2k MSMs of k DIFFERENT shrinking shapes —
    measured 31.9 s of the 43.4 s k=17 IPA prove in round 4, and the
    shape zoo is why its warmup (2458 s) dwarfed the KZG path's.

    Key identity: the folded generators stay G-linear —

        G^{(j)}[i] = Σ_{t ≡ i (mod 2^{k-j+1})}  w_t · G_t,
        w_t = Π_{r < j, bit_{k-r}(t) = 1} u_r^{-1},

    so every L_j/R_j main term is an n-point MSM over the ORIGINAL
    generator vector with cheap per-round scalar bookkeeping:

        L_j = Σ_t [bit_{k-j}(t) = 1] · w_t · a_lo^{(j)}[t mod 2^{k-j}] · G_t

    (and symmetrically for R_j). Per round: one masked w update, two
    tiled scalar builds, ONE batched 2-row MSM dispatch — every round
    hits the SAME compiled program / jax.export artifact. The group
    elements (hence proof bytes) are identical to the folding path."""
    F, pg, sp = cfg.SF, cfg.pg, cfg.sp
    n = int(a.shape[0])
    k = n.bit_length() - 1
    g_dev = jnp.asarray(params.g[:n])
    b = _powers_dev(x, n, F, sp)
    rho = blind
    wv = jnp.broadcast_to(jnp.asarray(F.ONE), (n, L16))
    idx = jnp.arange(n, dtype=jnp.uint32)

    for j in range(1, k + 1):
        half = n >> j
        hi = ((idx >> np.uint32(k - j)) & 1).astype(bool)[:, None]
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        l_b, m_b = _rand_scalar(rng, sp), _rand_scalar(rng, sp)
        reps = n // half
        s_l = jnp.where(hi, F.mul(wv, jnp.tile(a_lo, (reps, 1))), 0)
        s_r = jnp.where(hi, 0, F.mul(wv, jnp.tile(a_hi, (reps, 1))))
        pts2 = msm.msm_many_mont_aot(g_dev, jnp.stack([s_l, s_r]), 13)
        lmain, rmain = cfg.dev.to_affine_ints(np.asarray(pts2))
        ip_l = F.to_int(np.asarray(_ip(F, a_lo, b_hi)))
        ip_r = F.to_int(np.asarray(_ip(F, a_hi, b_lo)))
        Lp = pg.add(pg.add(lmain, pg.mul(params.u, ip_l)),
                    pg.mul(params.h, l_b))
        Rp = pg.add(pg.add(rmain, pg.mul(params.u, ip_r)),
                    pg.mul(params.h, m_b))
        tw.write_point(Lp)
        tw.write_point(Rp)
        u_j = tw.squeeze_challenge()
        u_inv = pow(u_j, -1, sp)
        a = _fold_scalars(F, a, jnp.asarray(F.from_int(u_j)))
        b = _fold_scalars(F, b, jnp.asarray(F.from_int(u_inv)))
        wv = jnp.where(
            hi, F.mul(wv, jnp.broadcast_to(jnp.asarray(F.from_int(u_inv)),
                                           (n, L16))), wv)
        rho = (rho + u_inv * l_b + u_j * m_b) % sp

    a0 = F.to_int(np.asarray(a)[0])
    tw.write_scalar(a0)
    tw.write_scalar(rho)


def open_poly(params: ParamsIPA, coeffs_mont, blind: int, x: int,
              v: int, tw, rng=None) -> None:
    """Write the log-size opening proof for a(x) = v to the transcript."""
    cfg = _cfg(params)
    F, pg, sp = cfg.SF, cfg.pg, cfg.sp
    a = jnp.asarray(coeffs_mont)
    m = int(a.shape[0])
    assert m & (m - 1) == 0, "power-of-two length"
    if cfg.name == "bn254" and m >= 4096:
        return _open_poly_fixed_shape(params, cfg, a, blind, x, tw, rng)
    g_cur = jnp.asarray(params.g[:m])
    b = _powers_dev(x, m, F, sp)
    rho = blind

    while m > 1:
        half = m // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo, g_hi = g_cur[:half], g_cur[half:]
        l_b, m_b = _rand_scalar(rng, sp), _rand_scalar(rng, sp)
        lmain = cfg.dev.to_affine_ints(
            np.asarray(_msm_mont_cfg(cfg, g_hi, a_lo))[None])[0]
        rmain = cfg.dev.to_affine_ints(
            np.asarray(_msm_mont_cfg(cfg, g_lo, a_hi))[None])[0]
        ip_l = F.to_int(np.asarray(_ip(F, a_lo, b_hi)))
        ip_r = F.to_int(np.asarray(_ip(F, a_hi, b_lo)))
        L = pg.add(pg.add(lmain, pg.mul(params.u, ip_l)),
                   pg.mul(params.h, l_b))
        R = pg.add(pg.add(rmain, pg.mul(params.u, ip_r)),
                   pg.mul(params.h, m_b))
        tw.write_point(L)
        tw.write_point(R)
        u_j = tw.squeeze_challenge()
        u_inv = pow(u_j, -1, sp)
        uk = jnp.asarray(F.from_int(u_j))
        a = _fold_scalars(F, a, uk)
        b = _fold_scalars(F, b, jnp.asarray(F.from_int(u_inv)))
        g_cur = cfg.dev.add(g_lo, _scale_points(
            cfg.dev, g_hi, _bits(u_inv, 255 if cfg.name != "bn254"
                                 else 254)))
        rho = (rho + u_inv * l_b + u_j * m_b) % sp
        m = half

    a0 = F.to_int(np.asarray(a)[0])
    tw.write_scalar(a0)
    tw.write_scalar(rho)


def _read_opening(tr, n: int):
    """Read one opening proof off the transcript -> (us, lrs, a0, rho_f)."""
    k = n.bit_length() - 1
    us: List[int] = []
    lrs: List[Tuple] = []
    for _ in range(k):
        L = tr.read_point()
        R = tr.read_point()
        lrs.append((L, R))
        us.append(tr.squeeze_challenge())
    return us, lrs, tr.read_scalar(), tr.read_scalar()


def _s_vector(us: Sequence[int], p: int = PFR.p) -> List[int]:
    """s vector by fold expansion: round j consumes original-index bit
    k-1-j (round 1 splits the top half), so iterate rounds in REVERSE —
    the first doubling step must install the last round's factor at
    bit 0. O(n) host muls."""
    s = [1]
    for u_j in reversed(us):
        ui = pow(u_j, -1, p)
        s = s + [t * ui % p for t in s]
    return s


def _check_opening(params: ParamsIPA, commitment, x: int, v: int,
                   n: int, us, lrs, a0: int, rho_f: int, g0) -> bool:
    """The O(log n) host-side tail of one opening check (g0 = ⟨s, G⟩)."""
    cfg = _cfg(params)
    p = cfg.sp
    b0 = 1
    for j, u_j in enumerate(us):
        b0 = b0 * (1 + pow(u_j, -1, p)
                   * pow(x, n >> (j + 1), p)) % p
    g1 = cfg.pg
    lhs = g1.add(g1.add(g1.mul(g0, a0),
                        g1.mul(params.u, a0 * b0 % p)),
                 g1.mul(params.h, rho_f))
    rhs = g1.add(commitment, g1.mul(params.u, v % p))
    for (L, R), u_j in zip(lrs, us):
        rhs = g1.add(rhs, g1.mul(L, pow(u_j, -1, p)))
        rhs = g1.add(rhs, g1.mul(R, u_j))
    return lhs == rhs


def verify_poly(params: ParamsIPA, commitment, x: int, v: int, tr,
                n: Optional[int] = None) -> bool:
    """Replay one opening proof; one n-point MSM + O(log n) group ops."""
    cfg = _cfg(params)
    n = n or params.n
    us, lrs, a0, rho_f = _read_opening(tr, n)
    sv = np.asarray(cfg.SF.from_ints(_s_vector(us, cfg.sp)))
    g0 = cfg.dev.to_affine_ints(
        np.asarray(_msm_mont_cfg(cfg, jnp.asarray(params.g[:n]),
                                 jnp.asarray(sv)))[None])[0]
    return _check_opening(params, commitment, x, v, n, us, lrs, a0, rho_f,
                          g0)


# ---------------------------------------------------------------------------
# multiopen: batch (poly, point, eval) claims
# ---------------------------------------------------------------------------

@dataclass
class IPAClaim:
    """One opening claim against a committed polynomial."""

    point: int
    value: int
    coeffs_mont: object = None          # prover: (n, 16) device
    blind: int = 0                      # prover
    commitment: object = None           # verifier: affine ints


def open_claims(params: ParamsIPA, claims: Sequence[IPAClaim], tw,
                rng=None) -> None:
    """Group claims by point, RLC each group with a Fiat–Shamir challenge,
    emit one IPA opening per distinct point (halo2's multiopen collapses
    further via its q-polynomial trick; per-point RLC is this backend's
    pinned format — same asymptotics per distinct rotation point)."""
    cfg = _cfg(params)
    F, sp = cfg.SF, cfg.sp
    q = tw.squeeze_challenge()
    by_pt: dict = {}
    for cl in claims:
        by_pt.setdefault(cl.point, []).append(cl)
    for x in sorted(by_pt):
        group = by_pt[x]
        acc = jnp.asarray(group[0].coeffs_mont)
        vv, rr, qp = group[0].value, group[0].blind, 1
        for cl in group[1:]:
            qp = qp * q % sp
            qk = jnp.broadcast_to(jnp.asarray(F.from_int(qp)), acc.shape)
            acc = F.add(acc, F.mul(qk, jnp.asarray(cl.coeffs_mont)))
            vv = (vv + qp * cl.value) % sp
            rr = (rr + qp * cl.blind) % sp
        open_poly(params, acc, rr, x, vv, tw, rng=rng)


def verify_claims(params: ParamsIPA, claims: Sequence[IPAClaim], tr,
                  n: Optional[int] = None) -> bool:
    """All per-point openings verified with ONE batched device MSM.

    The transcript is replayed group-by-group first (collecting each
    opening's challenges and s-vector), then the ~5 n-point ⟨s, G⟩ MSMs —
    the whole verifier device cost — run as a single msm_many dispatch
    (VERDICT round-2 weak #6: the per-point eager MSMs were ~5 separate
    2^17-point dispatches per verify)."""
    cfg = _cfg(params)
    n = n or params.n
    q = tr.squeeze_challenge()
    by_pt: dict = {}
    for cl in claims:
        by_pt.setdefault(cl.point, []).append(cl)
    g1 = cfg.pg
    groups = []
    for x in sorted(by_pt):
        group = by_pt[x]
        com, vv, qp = group[0].commitment, group[0].value, 1
        for cl in group[1:]:
            qp = qp * q % cfg.sp
            com = g1.add(com, g1.mul(cl.commitment, qp))
            vv = (vv + qp * cl.value) % cfg.sp
        us, lrs, a0, rho_f = _read_opening(tr, n)
        groups.append((x, com, vv, us, lrs, a0, rho_f))
    svs = np.stack([np.asarray(cfg.SF.from_ints(_s_vector(us, cfg.sp)))
                    for (_, _, _, us, _, _, _) in groups])
    if cfg.name == "bn254":
        from ..utils import compilebudget as cb

        if cb.unify(n):
            accs = cb.chunked_call(
                jnp.asarray(svs),
                lambda x_: msm.msm_small_many_mont(
                    jnp.asarray(params.g[:n]), x_))
        else:
            accs = msm.msm_many_mont(jnp.asarray(params.g[:n]),
                                     jnp.asarray(svs), 13)
    else:
        accs = jnp.stack([
            _msm_mont_cfg(cfg, jnp.asarray(params.g[:n]),
                          jnp.asarray(svs[i]))
            for i in range(svs.shape[0])])
    g0s = cfg.dev.to_affine_ints(np.asarray(accs))
    for (x, com, vv, us, lrs, a0, rho_f), g0 in zip(groups, g0s):
        if not _check_opening(params, com, x, vv, n, us, lrs, a0, rho_f,
                              g0):
            return False
    return True


# ---------------------------------------------------------------------------
# compressed multiopen: SHPLONK-style single-opening reduction
# ---------------------------------------------------------------------------

def open_claims_compressed(params: ParamsIPA, dom, claims, tw,
                           rng=None) -> None:
    """Collapse EVERY (poly, points, evals) claim into ONE log-size IPA
    opening — the halo2-multiopen role (its q-poly trick; VERDICT r2
    missing #4), realized with the BDFG20/SHPLONK reduction this repo
    already runs in eval form for KZG (proof/shplonk.py):

      y ← FS    h(X)  = Σ y^i (f_i(X) − r_i(X)) / Z_{S_i}(X)
      W = IPAcommit(h, r_h) → transcript
      z ← FS    L(X)  = Σ c_i f_i(X) − const − Z_T(z)·h(X)   (L(z) = 0)
      one IPA opening of L at z with claimed value 0, where the verifier
      assembles C_L = Σ c_i·C_i − const·G_0 − Z_T(z)·W from commitment
      linearity (Pedersen with blind r_h flowing to −Z_T(z)·r_h on L).

    Replaces the round-2 per-point RLC (~5 independent openings and
    n-point G-folds per k=17 proof: measured 81 s of a 89 s IPA prove —
    this does ONE). claims: shplonk.Claim list (prover: evals_dev AND
    coeffs_dev set; BN254 only — the full pipeline is BN254)."""
    from . import shplonk
    from .domain import Domain

    cfg = _cfg(params)
    assert cfg.name == "bn254", "pipeline multiopen is BN254"
    p = cfg.sp
    roots = shplonk._roots_table(dom.k)
    C = len(claims)
    S = max(len(cl.points) for cl in claims)

    y = tw.squeeze_challenge()
    evs = jnp.stack([jnp.asarray(cl.evals_dev) for cl in claims])
    rs = [shplonk._interp(cl.points, cl.evals) for cl in claims]
    rcoef = cfg.SF.from_ints(
        [[r[j] if j < len(r) else 0 for j in range(S)] for r in rs])
    plimbs = cfg.SF.from_ints(
        [[cl.points[j] if j < len(cl.points) else 0 for j in range(S)]
         for cl in claims])
    pmask = np.asarray([[j < len(cl.points) for j in range(S)]
                        for cl in claims])
    ypows_i = [1] * C
    for i in range(1, C):
        ypows_i[i] = ypows_i[i - 1] * y % p
    ypows = cfg.SF.from_ints(ypows_i)

    h_ev = shplonk._h_pass(evs, jnp.asarray(rcoef), jnp.asarray(plimbs),
                           jnp.asarray(pmask), jnp.asarray(ypows), roots)
    h_coeff = dom.intt(h_ev)
    r_h = _rand_scalar(rng, p)
    w_pt = commit(params, h_coeff, r_h)
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
        const = (const + c * shplonk._poly_eval(r, z)) % p

    l_ev = shplonk._l_pass(evs, jnp.asarray(cfg.SF.from_ints(cs)),
                           jnp.asarray(cfg.SF.from_int(const)),
                           jnp.asarray(cfg.SF.from_int(zt_z)), h_ev,
                           roots, jnp.asarray(cfg.SF.from_int(z)))
    # _l_pass returns L(X)/(X−z) on H (the KZG witness); undo the division
    # by multiplying back — cheaper: rebuild L directly from its pieces.
    lc = None   # assembled below in coefficient form instead
    del l_ev, lc
    csk = jnp.asarray(cfg.SF.from_ints(cs))
    term = cfg.SF.mul(
        jnp.broadcast_to(csk[:, None, :], evs.shape), evs)
    l_eval = term[0]
    for i in range(1, C):
        l_eval = cfg.SF.add(l_eval, term[i])
    constk = jnp.asarray(cfg.SF.from_int(const))
    l_eval = cfg.SF.sub(l_eval, jnp.broadcast_to(constk, l_eval.shape))
    l_eval = cfg.SF.sub(
        l_eval, cfg.SF.mul(jnp.broadcast_to(
            jnp.asarray(cfg.SF.from_int(zt_z)), l_eval.shape), h_ev))
    l_coeff = dom.intt(l_eval)
    blind_l = (-zt_z * r_h) % p
    open_poly(params, l_coeff, blind_l, z, 0, tw, rng=rng)


def verify_claims_compressed(params: ParamsIPA, dom, claims, tr) -> bool:
    """Verifier for :func:`open_claims_compressed`: assemble C_L by
    commitment linearity (host group ops), then ONE opening check (one
    n-point s-vector MSM on device)."""
    from . import shplonk

    cfg = _cfg(params)
    p = cfg.sp
    g1 = cfg.pg
    y = tr.squeeze_challenge()
    w_pt = tr.read_point()
    z = tr.squeeze_challenge()
    t_all = sorted({pt for cl in claims for pt in cl.points})
    zt_z = 1
    for s in t_all:
        zt_z = zt_z * (z - s) % p
    acc = None
    const = 0
    ypow = 1
    for cl in claims:
        zts = 1
        for s in t_all:
            if s not in cl.points:
                zts = zts * (z - s) % p
        c = ypow * zts % p
        term = g1.mul(cl.commitment, c)
        acc = term if acc is None else g1.add(acc, term)
        r = shplonk._interp(cl.points, cl.evals)
        const = (const + c * shplonk._poly_eval(r, z)) % p
        ypow = ypow * y % p
    g0_pt = cfg.dev.to_affine_ints(np.asarray(params.g[:1]))[0]
    c_l = g1.add(acc, g1.neg(g1.mul(g0_pt, const)))
    c_l = g1.add(c_l, g1.neg(g1.mul(w_pt, zt_z)))
    return verify_poly(params, c_l, z, 0, tr, n=dom.n)
