"""create_proof: the full PLONKish IOP on device (SURVEY.md §2.3 N3).

Mirrors halo2's `create_proof` phase structure
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:64-81, SURVEY.md
§3.4): advice commitments → θ → lookup permutations → β,γ → grand products
→ y → quotient on the extended coset → x → evaluations → SHPLONK multiopen.
Each phase is batched device compute (MSM/NTT/pointwise field kernels);
only the Blake2b transcript and a handful of scalars live on the host.

TPU-native specifics:
* Lookup permutations are a static-shape sort + scatter (no dynamic sizes):
  inputs/table rows are argsorted by dense value with tail rows pinned via a
  sentinel key; S' is assembled by rank-scatter of unconsumed table rows.
* Grand products use a Hillis–Steele cumulative product with the stride as
  a traced scan element — one field-mul graph instantiation total (the same
  trick as ops/msm.py; `associative_scan` clones the mul graph 2·log n ×).
* Quotient numerator = the shared constraint enumeration
  (proof/constraints.py) evaluated over extended-coset tensors.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.ir import BLINDING_ROWS, CircuitDef, u64_cols_to_field
from ..ops.field import FR as F
from ..ops.pyfield import FR as PFR
from . import constraints, shplonk, srs
from .domain import DELTA, EXT_FACTOR, Domain
from .keygen import ProvingKey
from .transcript import Blake2bWrite

MSM_C = 8


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def _cumprod_incl(x):
    """Inclusive cumulative field product along axis 0 (Hillis–Steele with
    traced strides: one mul-graph instantiation)."""
    n = x.shape[0]
    steps = max(1, (n - 1).bit_length())
    strides = jnp.asarray([1 << s for s in range(steps)], jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)
    one = jnp.broadcast_to(jnp.asarray(F.ONE), x.shape)

    def body(v, stride):
        prev = jnp.roll(v, stride, axis=0)
        prev = jnp.where((ids < stride)[:, None], one, prev)
        return F.mul(v, prev), None

    out, _ = jax.lax.scan(body, x, strides)
    return out


def field_sum(a):
    """Σ rows of (m, 16) -> (16,) via pairwise halving."""
    m = a.shape[0]
    while m > 1:
        if m % 2:
            a = jnp.concatenate([a, jnp.zeros((1, 16), jnp.uint32)], axis=0)
            m += 1
        a = F.add(a[0::2], a[1::2])
        m //= 2
    return a[0]


def powers_dev(x: int, n: int):
    """[1, x, x², … x^{n-1}] as (n,16) Montgomery limbs (log-doubling)."""
    arr = jnp.asarray(F.from_ints([1, x % PFR.p]))
    while arr.shape[0] < n:
        m = arr.shape[0]
        xm = jnp.broadcast_to(jnp.asarray(F.from_int(pow(x, m, PFR.p))),
                              arr.shape)
        arr = jnp.concatenate([arr, F.mul(arr, xm)], axis=0)
    return arr[:n]


def eval_coeffs_at(coeffs, x: int) -> int:
    """Evaluate a coefficient-form device poly at a host point."""
    pows = powers_dev(x, coeffs.shape[0])
    return F.to_int(field_sum(F.mul(coeffs, pows)))


def _theta_compress(cols: List[jnp.ndarray], theta: int):
    acc = cols[0]
    tp = 1
    for c in cols[1:]:
        tp = tp * theta % PFR.p
        tk = jnp.broadcast_to(jnp.asarray(F.from_int(tp)), c.shape)
        acc = F.add(acc, F.mul(tk, c))
    return acc


def _lookup_perm_indices(in_d: np.ndarray, tb_d: np.ndarray, u: int):
    """Sorted-input / rearranged-table row indices for one lookup.

    in_d, tb_d: (n,) uint32 dense key columns (lookup values < 2^16, so the
    0xFFFFFFFF sentinel that pins tail rows in place is collision-free).
    Returns (perm_in, perm_tb) int32 row-index arrays."""
    n = in_d.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    sent = np.uint32(0xFFFFFFFF)
    ki = jnp.where(ids < u, in_d, sent)
    kt = jnp.where(ids < u, tb_d, sent)
    perm_in = jnp.argsort(ki, stable=True).astype(jnp.int32)
    perm_tb0 = jnp.argsort(kt, stable=True).astype(jnp.int32)
    sk = ki[perm_in]
    tk = kt[perm_tb0]
    usable = ids < u
    first = usable & ((ids == 0) | (sk != jnp.roll(sk, 1)))
    t_first = usable & ((ids == 0) | (tk != jnp.roll(tk, 1)))
    pos_in_a = jnp.searchsorted(sk, tk)
    in_a = sk[jnp.minimum(pos_in_a, n - 1)] == tk
    consumed = t_first & in_a
    # leftovers (unconsumed usable table rows) fill non-first positions
    lrank = jnp.cumsum((~consumed & usable).astype(jnp.int32)) - 1
    nfrank = jnp.cumsum((~first & usable).astype(jnp.int32)) - 1
    dest = jnp.zeros((n,), jnp.int32).at[
        jnp.where(~first & usable, nfrank, n)].set(ids, mode="drop")
    pos_in_t = jnp.searchsorted(tk, sk)
    sperm = jnp.where(first, perm_tb0[jnp.minimum(pos_in_t, n - 1)], 0)
    sperm = sperm.at[jnp.where(~consumed & usable, dest[lrank], n)
                     ].set(perm_tb0, mode="drop")
    sperm = jnp.where(usable, sperm, ids)
    return perm_in, sperm


def _grand_product(ratio, carry: int = 1):
    """Z with Z[0]=carry, Z[i]=carry·∏_{j<i} ratio[j] (exclusive cumprod)."""
    incl = _cumprod_incl(ratio)
    ck = jnp.broadcast_to(jnp.asarray(F.from_int(carry)), ratio.shape)
    z = jnp.concatenate([ck[:1], F.mul(ck[:-1], incl[:-1])], axis=0)
    zlast = F.mul(ck[0], incl[-1])
    return z, zlast


def _mask_tail_one(x, u: int):
    one = jnp.broadcast_to(jnp.asarray(F.ONE), x.shape)
    ids = jnp.arange(x.shape[0])
    return jnp.where((ids < u)[:, None], x, one)


# ---------------------------------------------------------------------------
# query schedule (canonical, shared with the verifier)
# ---------------------------------------------------------------------------

def query_schedule(vk) -> List[Tuple[str, Tuple[int, ...]]]:
    """[(poly name, rotations)] in canonical order."""
    circ: CircuitDef = vk.circ
    u = circ.usable_rows
    rots: Dict[str, set] = {}
    for g in circ.gates:
        for col, r in g.poly.vars():
            rots.setdefault(col, set()).add(r)
    out = []
    for name in circ.advice_names:
        out.append((name, tuple(sorted(rots.get(name, set()) | {0}))))
    for name in sorted(circ.fixed):
        out.append((name, tuple(sorted(rots.get(name, set()) | {0}))))
    for i in range(len(vk.perm_cols)):
        out.append((f"perm.sigma{i}", (0,)))
    for lk in circ.lookups:
        out.append((f"{lk.name}.a_perm", (-1, 0)))
        out.append((f"{lk.name}.s_perm", (0,)))
        out.append((f"{lk.name}.z", (0, 1)))
    nz = len(vk.perm_chunks)
    for j in range(nz):
        rr = (0, 1) if j == nz - 1 else (0, 1, u)
        out.append((f"perm.z{j}", rr))
    for i in range(EXT_FACTOR):
        out.append((f"h{i}", (0,)))
    return out


def rotation_point(dom: Domain, x: int, rot: int) -> int:
    return x * pow(dom.omega, rot, PFR.p) % PFR.p


# ---------------------------------------------------------------------------
# extended-domain constraint context
# ---------------------------------------------------------------------------

class _ExtCtx:
    def __init__(self, dom: Domain, coeffs: Dict[str, jnp.ndarray],
                 pk: ProvingKey, chal: Dict[str, int]):
        self.dom = dom
        self.coeffs = coeffs
        self.pk = pk
        self._ext: Dict[str, jnp.ndarray] = {}
        self._rolled: Dict[Tuple[str, int], jnp.ndarray] = {}
        shape = (dom.ext_n, 16)
        self.l0 = jnp.asarray(pk.ext_selectors["l0"])
        self.llast = jnp.asarray(pk.ext_selectors["llast"])
        lblind = jnp.asarray(pk.ext_selectors["lblind"])
        one = jnp.broadcast_to(jnp.asarray(F.ONE), shape)
        self.active = F.sub(F.sub(one, self.llast), lblind)
        for name in ("theta", "beta", "gamma", "y"):
            setattr(self, name, self.const(chal[name]))
        # X on the extended coset (for the permutation identity terms)
        e1 = np.zeros((dom.n, 16), np.uint32)
        e1[1] = F.ONE
        self.xext = dom.coeff_to_extended(jnp.asarray(e1))

    def const(self, v: int):
        return jnp.broadcast_to(jnp.asarray(F.from_int(v)),
                                (self.dom.ext_n, 16))

    def get(self, name: str, rot: int):
        key = (name, rot)
        if key not in self._rolled:
            if name not in self._ext:
                self._ext[name] = self.dom.coeff_to_extended(
                    self.coeffs[name])
            ext = self._ext[name]
            self._rolled[key] = (
                jnp.roll(ext, -rot * EXT_FACTOR, axis=0) if rot else ext)
        return self._rolled[key]

    def identity(self, gi: int):
        dk = jnp.broadcast_to(
            jnp.asarray(F.from_int(pow(DELTA, gi, PFR.p))),
            (self.dom.ext_n, 16))
        return F.mul(dk, self.xext)

    def add(self, a, b):
        return F.add(a, b)

    def sub(self, a, b):
        return F.sub(a, b)

    def mul(self, a, b):
        return F.mul(a, b)


# ---------------------------------------------------------------------------
# create_proof
# ---------------------------------------------------------------------------

def create_proof(params: srs.ParamsKZG, pk: ProvingKey,
                 advice_u64: Dict[str, np.ndarray],
                 instance_u64: Dict[str, np.ndarray],
                 seed: int = 0) -> bytes:
    import random

    vk = pk.vk
    circ = vk.circ
    dom = Domain(circ.k)
    n, u = dom.n, circ.usable_rows
    rng = random.Random(("zkodst-blind", seed).__repr__())
    tw = Blake2bWrite()
    vk.hash_into(tw)

    # absorb the instance columns (verifier recomputes the same bytes)
    import hashlib
    hsh = hashlib.blake2b(digest_size=64)
    for name in circ.instance_names:
        hsh.update(np.asarray(instance_u64[name], np.uint32).tobytes())
    tw.common_scalar(int.from_bytes(hsh.digest(), "little") % PFR.p)

    # --- field forms; blind the advice tail with full-width randoms --------
    evals: Dict[str, jnp.ndarray] = {}
    for name in circ.advice_names:
        ev = u64_cols_to_field(F, jnp.asarray(advice_u64[name]))
        blinds = F.from_ints([rng.randrange(PFR.p)
                              for _ in range(BLINDING_ROWS)])
        ev = ev.at[n - BLINDING_ROWS:].set(jnp.asarray(blinds))
        evals[name] = ev
    for name in circ.instance_names:
        evals[name] = u64_cols_to_field(
            F, jnp.asarray(np.asarray(instance_u64[name], np.uint32)))
    for name, fe in pk.fixed_evals.items():
        evals[name] = fe
    for i, se in enumerate(pk.sigma_evals):
        evals[f"perm.sigma{i}"] = se

    # --- phase 1: advice commitments (one batched MSM dispatch) -------------
    for pt in srs.commit_lagrange_many(
            params, jnp.stack([evals[n] for n in circ.advice_names]), MSM_C):
        tw.write_point(pt)

    theta = tw.squeeze_challenge()

    # --- phase 2: lookup permutations ---------------------------------------
    lk_data = {}
    lk_cols = []
    for lk in circ.lookups:
        a_cmp = _theta_compress([evals[c] for c in lk.input_cols], theta)
        s_cmp = _theta_compress([evals[c] for c in lk.table_cols], theta)
        in_d = jnp.asarray(advice_u64[lk.input_cols[0]])[:, 0]
        tb_d = jnp.asarray(circ.fixed[lk.table_cols[0]])[:, 0]
        pi, pt = _lookup_perm_indices(in_d, tb_d, u)
        ap = a_cmp[pi]
        sp = s_cmp[pt]
        evals[f"{lk.name}.a_perm"] = ap
        evals[f"{lk.name}.s_perm"] = sp
        lk_data[lk.name] = (a_cmp, s_cmp, ap, sp)
        lk_cols.extend([ap, sp])
    if lk_cols:
        for pt in srs.commit_lagrange_many(params, jnp.stack(lk_cols),
                                           MSM_C):
            tw.write_point(pt)

    beta = tw.squeeze_challenge()
    gamma = tw.squeeze_challenge()
    bk = jnp.broadcast_to(jnp.asarray(F.from_int(beta)), (n, 16))
    gk = jnp.broadcast_to(jnp.asarray(F.from_int(gamma)), (n, 16))

    # --- phase 3a: permutation grand products -------------------------------
    delta_pows = [pow(DELTA, i, PFR.p) for i in range(len(vk.perm_cols))]
    carry = 1
    nz = len(vk.perm_chunks)
    col_of = {c: i for i, c in enumerate(vk.perm_cols)}
    roots = pk.roots
    zcols = []
    for j, chunk in enumerate(vk.perm_chunks):
        num = jnp.broadcast_to(jnp.asarray(F.ONE), (n, 16))
        den = num
        for c in chunk:
            gi = col_of[c]
            a = evals[c]
            dk = jnp.broadcast_to(
                jnp.asarray(F.from_int(delta_pows[gi])), (n, 16))
            ident = F.mul(dk, roots)
            num = F.mul(num, F.add(a, F.add(F.mul(bk, ident), gk)))
            den = F.mul(den, F.add(
                a, F.add(F.mul(bk, evals[f"perm.sigma{gi}"]), gk)))
        ratio = _mask_tail_one(F.mul(num, F.inv_batch(den)), u)
        z, zlast = _grand_product(ratio, carry)
        carry = F.to_int(zlast)
        evals[f"perm.z{j}"] = z
        zcols.append(z)

    # --- phase 3b: lookup grand products -------------------------------------
    for lk in circ.lookups:
        a_cmp, s_cmp, ap, sp = lk_data[lk.name]
        num = F.mul(F.add(a_cmp, bk), F.add(s_cmp, gk))
        den = F.mul(F.add(ap, bk), F.add(sp, gk))
        ratio = _mask_tail_one(F.mul(num, F.inv_batch(den)), u)
        z, _ = _grand_product(ratio, 1)
        evals[f"{lk.name}.z"] = z
        zcols.append(z)
    # transcript order: permutation Z's then lookup Z's (one batched MSM)
    for pt in srs.commit_lagrange_many(params, jnp.stack(zcols), MSM_C):
        tw.write_point(pt)

    y = tw.squeeze_challenge()

    # --- phase 4: quotient ----------------------------------------------------
    coeffs = dict(pk.fixed_coeffs)
    for i, sc in enumerate(pk.sigma_coeffs):
        coeffs[f"perm.sigma{i}"] = sc
    for name, ev in evals.items():
        if name not in coeffs:
            coeffs[name] = dom.intt(ev)
    ctx = _ExtCtx(dom, coeffs, pk,
                  dict(theta=theta, beta=beta, gamma=gamma, y=y))
    numer = constraints.fold_y(ctx, constraints.enumerate_constraints(vk, ctx))
    h_ext = F.mul(numer, jnp.asarray(pk.ext_selectors["zh_inv"]))
    h_coeff = dom.extended_to_coeff(h_ext)             # (4n, 16)
    for i in range(EXT_FACTOR):
        chunk = h_coeff[i * n:(i + 1) * n]
        coeffs[f"h{i}"] = chunk
        evals[f"h{i}"] = dom.ntt(chunk)
    for pt in srs.commit_coeff_many(
            params, h_coeff.reshape(EXT_FACTOR, n, 16), MSM_C):
        tw.write_point(pt)

    x = tw.squeeze_challenge()

    # --- phase 5: evaluations --------------------------------------------------
    sched = query_schedule(vk)
    claims = []
    for name, rots in sched:
        pts, evs = [], []
        for r in rots:
            pt = rotation_point(dom, x, r)
            pts.append(pt)
            evs.append(eval_coeffs_at(coeffs[name], pt))
        for e in evs:
            tw.write_scalar(e)
        claims.append(shplonk.Claim(tuple(pts), tuple(evs),
                                    evals_dev=evals[name]))

    # --- phase 6: multiopen ------------------------------------------------------
    shplonk.open_claims(params, dom, claims, tw)
    return tw.finalize()
