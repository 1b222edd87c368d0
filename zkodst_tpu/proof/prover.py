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


@jax.jit
def _eval_stack_at(coeffs_stack, pows):
    """All-polys-at-one-point: (M, n, 16) × (n, 16) -> (M, 16).

    One dispatch per evaluation point instead of per (poly, point) — the
    eval phase was ~2600 eager relay round-trips."""
    prod = F.mul(coeffs_stack, pows[None])
    m = prod.shape[1]
    while m > 1:
        if m % 2:
            prod = jnp.concatenate(
                [prod, jnp.zeros_like(prod[:, :1])], axis=1)
            m += 1
        prod = F.add(prod[:, 0::2], prod[:, 1::2])
        m //= 2
    return prod[:, 0]


def eval_many(coeffs_list, points):
    """Evaluate every poly at every point: -> [M][P] host ints."""
    stack = jnp.stack(coeffs_list)
    cols = []
    for pt in points:
        pows = powers_dev(pt, stack.shape[1])
        cols.append(_eval_stack_at(stack, pows))
    grid = np.asarray(jnp.stack(cols, axis=1))          # (M, P, 16)
    m, p = grid.shape[:2]
    flat = F.to_ints(grid.reshape(m * p, 16))
    return [[int(flat[i * p + j]) for j in range(p)] for i in range(m)]


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


def _grand_product(ratio, carry16):
    """Z with Z[0]=carry, Z[i]=carry·∏_{j<i} ratio[j] (exclusive cumprod).

    carry16: (16,) Montgomery limbs (traced — lets the caller jit)."""
    incl = _cumprod_incl(ratio)
    ck = jnp.broadcast_to(carry16, ratio.shape)
    z = jnp.concatenate([ck[:1], F.mul(ck[:-1], incl[:-1])], axis=0)
    zlast = F.mul(ck[0], incl[-1])
    return z, zlast


@jax.jit
def _perm_z_pass(cols, sigmas, idents, bk, gk, carry16, mask):
    """One permutation-chunk grand product — single dispatch.

    cols/sigmas/idents: (m, n, 16); bk/gk/carry16: (16,); mask: (n,) bool
    (usable rows)."""
    m, n, _ = cols.shape
    one = jnp.broadcast_to(jnp.asarray(F.ONE), (n, 16))
    num = one
    den = one
    bb = jnp.broadcast_to(bk, (n, 16))
    gg = jnp.broadcast_to(gk, (n, 16))
    for i in range(m):
        num = F.mul(num, F.add(cols[i], F.add(F.mul(bb, idents[i]), gg)))
        den = F.mul(den, F.add(cols[i], F.add(F.mul(bb, sigmas[i]), gg)))
    ratio = F.mul(num, F.inv_batch(den))
    ratio = jnp.where(mask[:, None], ratio, one)
    return _grand_product(ratio, carry16)


@jax.jit
def _lookup_z_pass(a_cmp, s_cmp, ap, sp, bk, gk, mask):
    """One lookup grand product — single dispatch."""
    n = a_cmp.shape[0]
    one = jnp.broadcast_to(jnp.asarray(F.ONE), (n, 16))
    bb = jnp.broadcast_to(bk, (n, 16))
    gg = jnp.broadcast_to(gk, (n, 16))
    num = F.mul(F.add(a_cmp, bb), F.add(s_cmp, gg))
    den = F.mul(F.add(ap, bb), F.add(sp, gg))
    ratio = F.mul(num, F.inv_batch(den))
    ratio = jnp.where(mask[:, None], ratio, one)
    return _grand_product(ratio, jnp.asarray(F.ONE))[0]


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

class _RecCtx:
    """Dry-run context: records which (poly, rot) pairs the constraint
    system reads (host ints, no device work)."""

    def __init__(self):
        self.names = set()
        self.l0 = self.llast = self.active = 1
        self.theta = self.beta = self.gamma = self.y = 1

    def const(self, v):
        return 1

    def get(self, name, rot):
        self.names.add(name)
        return 1

    def identity(self, gi):
        return 1

    def add(self, a, b):
        return 0

    def sub(self, a, b):
        return 0

    def mul(self, a, b):
        return 0


class _ExtCtx:
    """Jit-traceable constraint context over extended-coset tensors.

    Everything per-proof (challenges, committed polys) enters as traced
    arguments so the numerator compiles ONCE per proving key."""

    def __init__(self, dom: Domain, exts: Dict[str, jnp.ndarray],
                 sels: Dict[str, jnp.ndarray], chal: Dict[str, jnp.ndarray],
                 xext):
        self.dom = dom
        self.exts = exts
        self._rolled: Dict[Tuple[str, int], jnp.ndarray] = {}
        shape = (dom.ext_n, 16)
        self.l0 = sels["l0"]
        self.llast = sels["llast"]
        one = jnp.broadcast_to(jnp.asarray(F.ONE), shape)
        self.active = F.sub(F.sub(one, self.llast), sels["lblind"])
        for name in ("theta", "beta", "gamma", "y"):
            setattr(self, name,
                    jnp.broadcast_to(chal[name], shape))
        self.xext = xext

    def const(self, v: int):
        return jnp.broadcast_to(jnp.asarray(F.from_int(v)),
                                (self.dom.ext_n, 16))

    def get(self, name: str, rot: int):
        key = (name, rot)
        if key not in self._rolled:
            ext = self.exts[name]
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


def _quotient_fn(vk, dom: Domain):
    """Build the once-per-key jitted quotient evaluator."""

    @jax.jit
    def fn(exts, sels, chal, xext):
        ctx = _ExtCtx(dom, exts, sels, chal, xext)
        numer = constraints.fold_y(
            ctx, constraints.enumerate_constraints(vk, ctx))
        return F.mul(numer, sels["zh_inv"])

    return fn


# ---------------------------------------------------------------------------
# create_proof
# ---------------------------------------------------------------------------

def create_proof(params: srs.ParamsKZG, pk: ProvingKey,
                 advice_u64: Dict[str, np.ndarray],
                 instance_u64: Dict[str, np.ndarray],
                 seed: int | None = None, metrics=None) -> bytes:
    """metrics: optional utils.timing.Metrics — records prove sub-phases
    (the reference's ark_std timer granularity, SURVEY.md §5.1). Phase ends
    are driven by the transcript's host syncs, so timings are honest.

    seed: None (default) draws blinding factors from OS entropy
    (`secrets`) — the production ZK path. Passing an int gives
    deterministic blinding for tests/golden fixtures only."""
    import contextlib
    import random
    import secrets

    def phase(label):
        return (metrics.phase(f"prove.{label}") if metrics is not None
                else contextlib.nullcontext())

    vk = pk.vk
    circ = vk.circ
    dom = Domain(circ.k)
    n, u = dom.n, circ.usable_rows
    if seed is None:
        rng = random.Random(secrets.token_bytes(32))
    else:
        rng = random.Random(("zkodst-blind", seed).__repr__())

    def blind_tail(ev):
        """Overwrite the BLINDING_ROWS tail rows (u+1 … n−1 — never read
        by an active constraint) with fresh randoms: halo2 blinds lookup
        A'/S'/Z and permutation Z the same way (`plonk::lookup::prover`
        semantics, SURVEY.md §2.3 N9)."""
        blinds = F.from_ints([rng.randrange(PFR.p)
                              for _ in range(BLINDING_ROWS)])
        return ev.at[n - BLINDING_ROWS:].set(jnp.asarray(blinds))
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
        evals[name] = blind_tail(
            u64_cols_to_field(F, jnp.asarray(advice_u64[name])))
    for name in circ.instance_names:
        evals[name] = u64_cols_to_field(
            F, jnp.asarray(np.asarray(instance_u64[name], np.uint32)))
    for name, fe in pk.fixed_evals.items():
        evals[name] = fe
    for i, se in enumerate(pk.sigma_evals):
        evals[f"perm.sigma{i}"] = se

    # --- phase 1: advice commitments (one batched MSM dispatch) -------------
    with phase("advice_commit"):
        for pt in srs.commit_lagrange_many(
                params, jnp.stack([evals[n] for n in circ.advice_names]),
                MSM_C):
            tw.write_point(pt)

    theta = tw.squeeze_challenge()

    # --- phase 2: lookup permutations ---------------------------------------
    lk_phase = phase("lookup_permute")
    lk_phase.__enter__()
    lk_data = {}
    lk_cols = []
    for lk in circ.lookups:
        a_cmp = _theta_compress([evals[c] for c in lk.input_cols], theta)
        s_cmp = _theta_compress([evals[c] for c in lk.table_cols], theta)
        in_d = jnp.asarray(advice_u64[lk.input_cols[0]])[:, 0]
        tb_d = jnp.asarray(circ.fixed[lk.table_cols[0]])[:, 0]
        pi, pt = _lookup_perm_indices(in_d, tb_d, u)
        ap = blind_tail(a_cmp[pi])
        sp = blind_tail(s_cmp[pt])
        evals[f"{lk.name}.a_perm"] = ap
        evals[f"{lk.name}.s_perm"] = sp
        lk_data[lk.name] = (a_cmp, s_cmp, ap, sp)
        lk_cols.extend([ap, sp])
    if lk_cols:
        for pt in srs.commit_lagrange_many(params, jnp.stack(lk_cols),
                                           MSM_C):
            tw.write_point(pt)
    lk_phase.__exit__(None, None, None)

    beta = tw.squeeze_challenge()
    gamma = tw.squeeze_challenge()
    bk = jnp.asarray(F.from_int(beta))
    gk = jnp.asarray(F.from_int(gamma))
    mask = jnp.arange(n) < u

    # --- phase 3a: permutation grand products (one dispatch per chunk) ------
    delta_pows = [pow(DELTA, i, PFR.p) for i in range(len(vk.perm_cols))]
    carry16 = jnp.asarray(F.ONE)
    col_of = {c: i for i, c in enumerate(vk.perm_cols)}
    roots = pk.roots
    zcols = []
    for j, chunk in enumerate(vk.perm_chunks):
        gis = [col_of[c] for c in chunk]
        cols = jnp.stack([evals[c] for c in chunk])
        sigmas = jnp.stack([evals[f"perm.sigma{gi}"] for gi in gis])
        idents = jnp.stack([
            F.mul(jnp.broadcast_to(
                jnp.asarray(F.from_int(delta_pows[gi])), (n, 16)), roots)
            for gi in gis])
        z, zlast = _perm_z_pass(cols, sigmas, idents, bk, gk, carry16,
                                mask)
        carry16 = zlast
        z = blind_tail(z)
        evals[f"perm.z{j}"] = z
        zcols.append(z)

    # --- phase 3b: lookup grand products (one dispatch each) ----------------
    for lk in circ.lookups:
        a_cmp, s_cmp, ap, sp = lk_data[lk.name]
        z = blind_tail(_lookup_z_pass(a_cmp, s_cmp, ap, sp, bk, gk, mask))
        evals[f"{lk.name}.z"] = z
        zcols.append(z)
    # transcript order: permutation Z's then lookup Z's (one batched MSM)
    with phase("grand_products_commit"):
        for pt in srs.commit_lagrange_many(params, jnp.stack(zcols), MSM_C):
            tw.write_point(pt)

    y = tw.squeeze_challenge()

    # --- phase 4: quotient (batched NTTs + one numerator dispatch) -----------
    q_phase = phase("quotient")
    q_phase.__enter__()
    coeffs = dict(pk.fixed_coeffs)
    for i, sc in enumerate(pk.sigma_coeffs):
        coeffs[f"perm.sigma{i}"] = sc
    new_names = [nm for nm in evals if nm not in coeffs]
    intt_stack = dom.intt(jnp.stack([evals[nm] for nm in new_names]))
    for i, nm in enumerate(new_names):
        coeffs[nm] = intt_stack[i]
    if not hasattr(pk, "_needed_names"):
        rec = _RecCtx()
        constraints.enumerate_constraints(vk, rec)
        pk._needed_names = sorted(rec.names)
        e1 = np.zeros((n, 16), np.uint32)
        e1[1] = F.ONE
        pk._xext = dom.coeff_to_extended(jnp.asarray(e1))
        pk._sels_dev = {k: jnp.asarray(v)
                        for k, v in pk.ext_selectors.items()}
        pk._quotient = _quotient_fn(vk, dom)
    # extend in groups (one dispatch per ~15 polys; full-stack transients
    # push past HBM)
    exts = {}
    G = 15
    for i in range(0, len(pk._needed_names), G):
        grp = pk._needed_names[i: i + G]
        ext_grp = dom.coeff_to_extended(
            jnp.stack([coeffs[nm] for nm in grp]))
        for j, nm in enumerate(grp):
            exts[nm] = ext_grp[j]
    chal_dev = {k: jnp.asarray(F.from_int(v)) for k, v in
                dict(theta=theta, beta=beta, gamma=gamma, y=y).items()}
    h_ext = pk._quotient(exts, pk._sels_dev, chal_dev, pk._xext)
    exts = None          # ~1.5 GB of extended tensors — free before commits
    lk_data = None
    h_coeff = dom.extended_to_coeff(h_ext)             # (4n, 16)
    h_ext = None
    for i in range(EXT_FACTOR):
        chunk = h_coeff[i * n:(i + 1) * n]
        coeffs[f"h{i}"] = chunk
        evals[f"h{i}"] = dom.ntt(chunk)
    for pt in srs.commit_coeff_many(
            params, h_coeff.reshape(EXT_FACTOR, n, 16), MSM_C):
        tw.write_point(pt)
    q_phase.__exit__(None, None, None)

    x = tw.squeeze_challenge()

    # --- phase 5: evaluations (batched: one dispatch per distinct point) ----
    sched = query_schedule(vk)
    all_rots = sorted({r for _, rots in sched for r in rots})
    rot_pos = {r: i for i, r in enumerate(all_rots)}
    with phase("evaluations"):
        grid = eval_many([coeffs[name] for name, _ in sched],
                         [rotation_point(dom, x, r) for r in all_rots])
    coeffs = None        # only eval forms are needed from here on
    claims = []
    for i, (name, rots) in enumerate(sched):
        pts = [rotation_point(dom, x, r) for r in rots]
        evs = [grid[i][rot_pos[r]] for r in rots]
        for e in evs:
            tw.write_scalar(e)
        claims.append(shplonk.Claim(tuple(pts), tuple(evs),
                                    evals_dev=evals[name]))

    # --- phase 6: multiopen ------------------------------------------------------
    with phase("multiopen"):
        shplonk.open_claims(params, dom, claims, tw)
    return tw.finalize()
