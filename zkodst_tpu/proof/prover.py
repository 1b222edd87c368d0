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

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.ir import BLINDING_ROWS, CircuitDef, u64_cols_to_field
from ..ops.field import FR as F
from ..ops.pyfield import FR as PFR
from . import constraints, pcs, shplonk, srs
from .domain import DELTA, EXT_FACTOR, Domain
from .keygen import ProvingKey
from .transcript import Blake2bWrite

# Pippenger window width: per-window seg-scan cost is c-independent, so
# fewer/wider windows win while the 2^c bucket suffix scans stay cheap.
# Measured on v5e (B=14 batched 2^17 MSM): c=8 10.0 s, c=12 7.7 s,
# c=13 7.2 s, c=16 8.4 s (the 65536-wide bucket scans give it back).
MSM_C = 13


# ---------------------------------------------------------------------------
# device helpers
# ---------------------------------------------------------------------------

def _cumprod_incl(x):
    """Inclusive cumulative field product along axis 0 — the chained
    limb-major kernel scan on TPU, Hillis–Steele elsewhere
    (Field.cumprod_incl)."""
    return F.cumprod_incl(x)


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


@jax.jit
def _eval_stack_at_points(coeffs_stack, xks):
    """(M, n, 16) coeff stack × (P, 16) points -> (M, P, 16) evaluations.

    The power tables build INSIDE the jit (log-doubling over traced x), so
    the whole eval phase is one dispatch — the eager powers_dev version
    paid ~17 relay RTTs per point."""
    n = coeffs_stack.shape[1]

    def per_point(xk):
        arr = jnp.stack([jnp.asarray(F.ONE), xk])
        while arr.shape[0] < n:
            xm = F.mul(arr[-1], xk)                    # x^m
            arr = jnp.concatenate(
                [arr, F.mul(arr, jnp.broadcast_to(xm, arr.shape))])
        return _eval_stack_at(coeffs_stack, arr[:n])   # (M, 16)

    return jnp.stack([per_point(xks[i]) for i in range(xks.shape[0])],
                     axis=1)


def eval_many(coeffs_list, points):
    """Evaluate every poly at every point: -> [M][P] host ints."""
    from ..utils import aot

    stack = jnp.stack(coeffs_list)
    xks = jnp.asarray(F.from_ints([int(pt) for pt in points]))
    key = (f"evalstack_M{stack.shape[0]}_n{stack.shape[1]}"
           f"_P{xks.shape[0]}")
    grid = np.asarray(aot.call(key, _eval_stack_at_points, stack, xks))
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


@partial(jax.jit, static_argnums=(2,))
def _prep_advice(adv_u64_stack, blinds, n: int):
    """(A, n, 2) u64 advice columns -> (A, n, 16) blinded field columns
    in ONE dispatch (u64→Montgomery conversion + blinding-tail set)."""
    ev = u64_cols_to_field(F, adv_u64_stack)
    return ev.at[:, n - BLINDING_ROWS:].set(blinds)


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


def _build_lookup_phase(circ: CircuitDef):
    """Once-per-key jitted lookup phase: θ-compress every lookup's input/
    table columns, apply the precomputed row permutations, blind the tails
    — one dispatch instead of ~8 eager ops per lookup (each eager op is a
    relay RTT on the axon backend)."""
    lookups = [(tuple(lk.input_cols), tuple(lk.table_cols))
               for lk in circ.lookups]
    n = circ.n

    @jax.jit
    def fn(cols, theta_k, perms, blinds):
        def compress(names):
            acc = cols[names[0]]
            tpow = None
            for c in names[1:]:
                tpow = (theta_k if tpow is None
                        else F.mul(tpow, theta_k))
                acc = F.add(acc, F.mul(
                    jnp.broadcast_to(tpow, acc.shape), cols[c]))
            return acc

        acmps, scmps, aps, sps = [], [], [], []
        for i, (incols, tbcols) in enumerate(lookups):
            a_cmp = compress(incols)
            s_cmp = compress(tbcols)
            ap = a_cmp[perms[i, 0]].at[n - BLINDING_ROWS:].set(blinds[2 * i])
            sp = s_cmp[perms[i, 1]].at[n - BLINDING_ROWS:].set(
                blinds[2 * i + 1])
            acmps.append(a_cmp)
            scmps.append(s_cmp)
            aps.append(ap)
            sps.append(sp)
        return (jnp.stack(acmps), jnp.stack(scmps), jnp.stack(aps),
                jnp.stack(sps))

    return fn


_SHARDED_Z_CACHE: dict = {}


def _z_passes_sharded(mesh, axis):
    """shard_map'd grand-product passes: same ratio math as
    _perm_z_pass/_lookup_z_pass per shard, then an all_gather of the D
    shard totals and an exclusive cross-shard carry fold (SURVEY.md §5.7
    "grand-product scans + cross-chip carries"). Bit-identical to the
    single-chip path — field muls are exact and associative."""
    axis = tuple(axis) if not isinstance(axis, str) else axis
    if (mesh, axis) in _SHARDED_Z_CACHE:
        return _SHARDED_Z_CACHE[(mesh, axis)]
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.bootstrap import axis_size

    ndev = axis_size(mesh, axis)

    def carry_fold(incl, carry16):
        tots = jax.lax.all_gather(incl[-1], axis)      # (D, 16) ratio prods
        idx = jax.lax.axis_index(axis)
        one = jnp.asarray(F.ONE)
        carry, total = carry16, carry16
        for d in range(ndev):
            carry = F.mul(carry, jnp.where(d < idx, tots[d], one))
            total = F.mul(total, tots[d])
        ck = jnp.broadcast_to(carry, incl.shape)
        z = jnp.concatenate([ck[:1], F.mul(ck[:-1], incl[:-1])], axis=0)
        return z, total

    def perm_local(cols, sigmas, idents, bk, gk, carry16, mask):
        m, nl, _ = cols.shape
        one = jnp.broadcast_to(jnp.asarray(F.ONE), (nl, 16))
        num, den = one, one
        bb = jnp.broadcast_to(bk, (nl, 16))
        gg = jnp.broadcast_to(gk, (nl, 16))
        for i in range(m):
            num = F.mul(num, F.add(cols[i],
                                   F.add(F.mul(bb, idents[i]), gg)))
            den = F.mul(den, F.add(cols[i],
                                   F.add(F.mul(bb, sigmas[i]), gg)))
        ratio = F.mul(num, F.inv_batch(den))
        ratio = jnp.where(mask[:, None], ratio, one)
        return carry_fold(_cumprod_incl(ratio), carry16)

    def lk_local(a_cmp, s_cmp, ap, sp, bk, gk, mask):
        nl = a_cmp.shape[0]
        one = jnp.broadcast_to(jnp.asarray(F.ONE), (nl, 16))
        bb = jnp.broadcast_to(bk, (nl, 16))
        gg = jnp.broadcast_to(gk, (nl, 16))
        num = F.mul(F.add(a_cmp, bb), F.add(s_cmp, gg))
        den = F.mul(F.add(ap, bb), F.add(sp, gg))
        ratio = F.mul(num, F.inv_batch(den))
        ratio = jnp.where(mask[:, None], ratio, one)
        return carry_fold(_cumprod_incl(ratio), jnp.asarray(F.ONE))[0]

    perm_fn = jax.jit(shard_map(
        perm_local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis),
                  P(), P(), P(), P(axis)),
        out_specs=(P(axis), P()), check_vma=False))
    lk_fn = jax.jit(shard_map(
        lk_local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P(axis)),
        out_specs=P(axis), check_vma=False))
    _SHARDED_Z_CACHE[(mesh, axis)] = (perm_fn, lk_fn)
    return perm_fn, lk_fn


# ---------------------------------------------------------------------------
# query schedule (canonical, shared with the verifier)
# ---------------------------------------------------------------------------

def absorb_instances(tw, circ: CircuitDef, instance_u64) -> None:
    """Bind the public inputs into the transcript (prover & verifier run
    the identical sequence).

    ``halo2ce`` mode: absorb every provided instance VALUE as a common
    scalar, column by column — halo2-ce's KZG path (QUERY_INSTANCE=false)
    hashes each element of `instances: &[&[F]]` into the transcript before
    the advice commitments (its plonk prover/verifier both do; the
    reference's bench passes instances into `create_proof` at
    blake2f_circuit_bench.rs:64-81). The provided vector is the circuit's
    declared `instance_len` prefix; padding rows past it are not public
    inputs. Byte parity is untestable here (no Rust toolchain) but this
    closes docs/FORMAT.md divergence 3 structurally.

    ``v1`` (pinned native format): one blake2b digest over the full
    columns, absorbed as a single scalar — cheaper for wide instance
    columns and equally binding."""
    import hashlib

    if getattr(tw, "mode", "v1") == "halo2ce":
        from ..ops import u64 as u64mod

        for name in circ.instance_names:
            ln = circ.instance_len.get(name)
            assert ln is not None, (
                f"halo2ce mode needs CircuitDef.instance_len[{name!r}] "
                "(the public-input vector length)")
            col = np.asarray(instance_u64[name], np.uint32)
            # Soundness: only the declared prefix is Fiat–Shamir-bound in
            # this mode, but the verifier's _instance_eval evaluates every
            # nonzero row of the caller-supplied column. An unabsorbed
            # nonzero row past the prefix would shift the claimed
            # instance evaluation after challenges are fixed (ADVICE r4
            # high) — halo2-ce has no such rows because its instance
            # vectors are exact-length (`instances: &[&[F]]`). Reject any.
            if col.shape[0] > ln and col[ln:].any():
                raise ValueError(
                    f"halo2ce mode: instance column {name!r} has nonzero "
                    f"rows past its declared instance_len={ln} prefix; "
                    "those rows would be unbound by the transcript")
            vals = col[:ln]
            for r in range(ln):
                tw.common_scalar(int(u64mod.to_int(vals[r])))
        return
    hsh = hashlib.blake2b(digest_size=64)
    for name in circ.instance_names:
        hsh.update(np.asarray(instance_u64[name], np.uint32).tobytes())
    tw.common_scalar(int.from_bytes(hsh.digest(), "little") % PFR.p)


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

def create_proof(params, pk: ProvingKey,
                 advice_u64: Dict[str, np.ndarray],
                 instance_u64: Dict[str, np.ndarray],
                 seed: int | None = None, metrics=None,
                 mesh=None, mesh_axis: str = "x",
                 transcript_mode: str = "v1") -> bytes:
    """params: srs.ParamsKZG (SHPLONK multiopen + pairing check) or
    ipa.ParamsIPA (transparent Bulletproofs-style multiopen) — the two
    backends of the reference, dispatched via proof/pcs.py.

    metrics: optional utils.timing.Metrics — records prove sub-phases
    (the reference's ark_std timer granularity, SURVEY.md §5.1). Phase ends
    are driven by the transcript's host syncs, so timings are honest.

    seed: None (default) draws blinding factors from OS entropy
    (`secrets`) — the production ZK path. Passing an int gives
    deterministic blinding for tests/golden fixtures only.

    mesh: optional jax.sharding.Mesh — the multi-chip prover (BASELINE.md
    config 5): commits run the sharded Pippenger (points over `mesh_axis`),
    domain transforms run the 4-step all-to-all NTT, grand products scan
    per shard with cross-chip carries. Proofs are bit-identical to the
    single-chip path (field/EC ops are exact; affine normalization kills
    projective-representation differences). The lookup row-permutation
    build (one argsort) and the SHPLONK tail stay replicated — both are
    O(n) one-shots, revisit if they ever profile."""
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
    is_ipa = pcs.is_ipa(params)
    if is_ipa:
        assert mesh is None, "IPA backend is single-chip (use KZG for mesh)"
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
    tw = Blake2bWrite(mode=transcript_mode)
    vk.hash_into(tw)
    # absorb the public inputs (verifier recomputes the same bytes)
    absorb_instances(tw, circ, instance_u64)

    # --- field forms; blind the advice tail with full-width randoms --------
    # ONE jitted dispatch for every column's u64→field conversion + tail
    # blind: the per-column eager chain (convert + upload + set, ~5 relay
    # dispatches × |advice|) was measurable prove time on the axon relay
    # (round 5; each warm eager dispatch costs ~15 ms there). Blinds are
    # drawn in the SAME per-name order as the old per-column loop, so the
    # rng stream — hence proof bytes — is unchanged.
    evals: Dict[str, jnp.ndarray] = {}
    adv_blinds = F.from_ints([[rng.randrange(PFR.p)
                               for _ in range(BLINDING_ROWS)]
                              for _ in circ.advice_names])
    adv_stack = _prep_advice(
        jnp.stack([jnp.asarray(advice_u64[name])
                   for name in circ.advice_names]),
        jnp.asarray(adv_blinds), n)
    for i, name in enumerate(circ.advice_names):
        evals[name] = adv_stack[i]
    for name in circ.instance_names:
        evals[name] = u64_cols_to_field(
            F, jnp.asarray(np.asarray(instance_u64[name], np.uint32)))
    for name, fe in pk.fixed_evals.items():
        evals[name] = fe
    for i, se in enumerate(pk.sigma_evals):
        evals[f"perm.sigma{i}"] = se

    # Lookup row permutations depend only on the witness (not on θ):
    # dispatch the argsorts NOW so the device works through them while the
    # host blocks on the advice-commitment readback below (phase overlap —
    # SURVEY.md §2.4 PP row).
    lk_perm_idx = {
        lk.name: _lookup_perm_indices(
            jnp.asarray(advice_u64[lk.input_cols[0]])[:, 0],
            jnp.asarray(circ.fixed[lk.table_cols[0]])[:, 0], u)
        for lk in circ.lookups}

    # Phase overlap (SURVEY.md §2.4 PP row): coefficient forms of already-
    # final columns are challenge-INDEPENDENT, so their iNTTs are enqueued
    # as each phase produces its columns — the device chews through them
    # while the host blocks on commit readbacks and transcript hashing,
    # instead of bunching every iNTT behind the y challenge in phase 4.
    # ZKODST_NO_OVERLAP=1 restores the bunched schedule (A/B measurement).
    import os as _os

    # (the IPA commit path iNTTs internally — early extra iNTTs would
    # just duplicate device work there)
    overlap = not _os.environ.get("ZKODST_NO_OVERLAP") and not is_ipa
    pre_coeffs: Dict[str, jnp.ndarray] = {}

    def pre_intt(names):
        if not overlap or not names:
            return
        stack = dom.intt(jnp.stack([evals[nm] for nm in names]),
                         mesh=mesh, mesh_axis=mesh_axis)
        for i, nm in enumerate(names):
            pre_coeffs[nm] = stack[i]

    pre_intt(list(circ.advice_names) + list(circ.instance_names))

    # --- phase 1: advice commitments (one batched MSM dispatch) -------------
    # advice cells are u64 values (the spread forms are < 2^32), so the
    # body MSM runs only the 64-bit windows; the full-width blinding tail
    # is a tiny separate MSM (srs.commit_lagrange_many body_bits split)
    with phase("advice_commit"):
        for pt in pcs.commit_evals_many(
                params, dom,
                jnp.stack([evals[n] for n in circ.advice_names]),
                MSM_C, mesh=mesh, mesh_axis=mesh_axis,
                body_bits=None if (mesh is not None or is_ipa) else 64,
                tail_rows=BLINDING_ROWS):
            tw.write_point(pt)

    theta = tw.squeeze_challenge()

    # --- phase 2: lookup permutations (ONE jitted dispatch for every
    # θ-compression + permutation gather + tail blinding) --------------------
    lk_phase = phase("lookup_permute")
    lk_phase.__enter__()
    lk_data = {}
    lk_cols = []
    if circ.lookups:
        if not hasattr(pk, "_lookup_phase_fn"):
            pk._lookup_phase_fn = _build_lookup_phase(circ)
        theta_k = jnp.asarray(F.from_int(theta))
        blinds = jnp.asarray(F.from_ints(
            [[rng.randrange(PFR.p) for _ in range(BLINDING_ROWS)]
             for _ in range(2 * len(circ.lookups))]))
        cols_in = {c: evals[c] for lk in circ.lookups
                   for c in (*lk.input_cols, *lk.table_cols)}
        perms = jnp.stack([jnp.stack(lk_perm_idx[lk.name])
                           for lk in circ.lookups])         # (L, 2, n)
        acmp, scmp, aps, sps = pk._lookup_phase_fn(cols_in, theta_k,
                                                   perms, blinds)
        for i, lk in enumerate(circ.lookups):
            evals[f"{lk.name}.a_perm"] = aps[i]
            evals[f"{lk.name}.s_perm"] = sps[i]
            lk_data[lk.name] = (acmp[i], scmp[i], aps[i], sps[i])
            lk_cols.extend([aps[i], sps[i]])
    if lk_cols:
        pre_intt([f"{lk.name}.{sfx}" for lk in circ.lookups
                  for sfx in ("a_perm", "s_perm")])
        for pt in pcs.commit_evals_many(params, dom, jnp.stack(lk_cols),
                                        MSM_C, mesh=mesh,
                                        mesh_axis=mesh_axis):
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
    if mesh is not None:
        perm_z_fn, lk_z_fn = _z_passes_sharded(mesh, mesh_axis)
    else:
        perm_z_fn, lk_z_fn = _perm_z_pass, _lookup_z_pass
    if not hasattr(pk, "_chunk_tables"):
        # σ / δ^col·ω^row tables are challenge-independent: build once per
        # key (the per-prove eager builds were ~2 relay RTTs per column)
        pk._chunk_tables = []
        for chunk in vk.perm_chunks:
            gis = [col_of[c] for c in chunk]
            sig = jnp.stack([evals[f"perm.sigma{gi}"] for gi in gis])
            ident = jnp.stack([
                F.mul(jnp.broadcast_to(
                    jnp.asarray(F.from_int(delta_pows[gi])), (n, 16)),
                    roots)
                for gi in gis])
            pk._chunk_tables.append((sig, ident))
    zcols = []
    for j, chunk in enumerate(vk.perm_chunks):
        cols = jnp.stack([evals[c] for c in chunk])
        sigmas, idents = pk._chunk_tables[j]
        z, zlast = perm_z_fn(cols, sigmas, idents, bk, gk, carry16,
                             mask)
        carry16 = zlast
        z = blind_tail(z)
        evals[f"perm.z{j}"] = z
        zcols.append(z)

    # --- phase 3b: lookup grand products (one dispatch each) ----------------
    for lk in circ.lookups:
        a_cmp, s_cmp, ap, sp = lk_data[lk.name]
        z = blind_tail(lk_z_fn(a_cmp, s_cmp, ap, sp, bk, gk, mask))
        evals[f"{lk.name}.z"] = z
        zcols.append(z)
    # transcript order: permutation Z's then lookup Z's (one batched MSM)
    with phase("grand_products_commit"):
        pre_intt([f"perm.z{j}" for j in range(len(vk.perm_chunks))]
                 + [f"{lk.name}.z" for lk in circ.lookups])
        for pt in pcs.commit_evals_many(params, dom, jnp.stack(zcols),
                                        MSM_C, mesh=mesh,
                                        mesh_axis=mesh_axis):
            tw.write_point(pt)

    y = tw.squeeze_challenge()

    # --- phase 4: quotient (batched NTTs + one numerator dispatch) -----------
    q_phase = phase("quotient")
    q_phase.__enter__()
    coeffs = dict(pk.fixed_coeffs)
    for i, sc in enumerate(pk.sigma_coeffs):
        coeffs[f"perm.sigma{i}"] = sc
    new_names = [nm for nm in evals if nm not in coeffs]
    missing = [nm for nm in new_names if nm not in pre_coeffs]
    if missing:
        intt_stack = dom.intt(jnp.stack([evals[nm] for nm in missing]),
                              mesh=mesh, mesh_axis=mesh_axis)
        for i, nm in enumerate(missing):
            coeffs[nm] = intt_stack[i]
    for nm in new_names:
        if nm not in coeffs:
            coeffs[nm] = pre_coeffs[nm]
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
    # push past HBM). Fixed/σ extensions are challenge-independent —
    # computed once per key and kept device-resident (~32 MB each at k=17).
    static_names = set(pk.fixed_coeffs) | {
        f"perm.sigma{i}" for i in range(len(pk.sigma_coeffs))}
    # keyed BY MESH: these tensors are device-placed by the mesh they
    # were extended over; reusing one pk across different meshes (e.g.
    # proof-level DP over disjoint device groups, dryrun stage 3c)
    # otherwise mixes device assignments inside _quotient
    mesh_key = (mesh, tuple(mesh_axis) if isinstance(mesh_axis, (list,
                tuple)) else mesh_axis) if mesh is not None else None
    if not hasattr(pk, "_static_exts_by_mesh"):
        pk._static_exts_by_mesh = {}
    if mesh_key not in pk._static_exts_by_mesh:
        se = {}
        grp_names = [nm for nm in pk._needed_names if nm in static_names]
        for i in range(0, len(grp_names), 15):
            grp = grp_names[i: i + 15]
            ext_grp = dom.coeff_to_extended(
                jnp.stack([coeffs[nm] for nm in grp]), mesh=mesh,
                mesh_axis=mesh_axis)
            for j, nm in enumerate(grp):
                se[nm] = ext_grp[j]
        pk._static_exts_by_mesh[mesh_key] = se
    exts = dict(pk._static_exts_by_mesh[mesh_key])
    G = 15
    dyn_names = [nm for nm in pk._needed_names if nm not in static_names]
    for i in range(0, len(dyn_names), G):
        grp = dyn_names[i: i + G]
        ext_grp = dom.coeff_to_extended(
            jnp.stack([coeffs[nm] for nm in grp]), mesh=mesh,
            mesh_axis=mesh_axis)
        for j, nm in enumerate(grp):
            exts[nm] = ext_grp[j]
    chal_dev = {k: jnp.asarray(F.from_int(v)) for k, v in
                dict(theta=theta, beta=beta, gamma=gamma, y=y).items()}
    h_ext = pk._quotient(exts, pk._sels_dev, chal_dev, pk._xext)
    exts = None          # ~1.5 GB of extended tensors — free before commits
    lk_data = None
    h_coeff = dom.extended_to_coeff(h_ext, mesh=mesh,
                                    mesh_axis=mesh_axis)   # (4n, 16)
    h_ext = None
    h_evals = dom.ntt(h_coeff.reshape(EXT_FACTOR, n, 16), mesh=mesh,
                      mesh_axis=mesh_axis)
    for i in range(EXT_FACTOR):
        coeffs[f"h{i}"] = h_coeff[i * n:(i + 1) * n]
        evals[f"h{i}"] = h_evals[i]
    for pt in pcs.commit_coeff_many(
            params, h_coeff.reshape(EXT_FACTOR, n, 16), MSM_C,
            mesh=mesh, mesh_axis=mesh_axis):
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
    claims = []
    for i, (name, rots) in enumerate(sched):
        pts = [rotation_point(dom, x, r) for r in rots]
        evs = [grid[i][rot_pos[r]] for r in rots]
        for e in evs:
            tw.write_scalar(e)
        claims.append(shplonk.Claim(
            tuple(pts), tuple(evs), evals_dev=evals[name]))
    coeffs = None        # only the per-claim eval forms are needed below
    # (both schemes' multiopens run the eval-form h/L reduction — pcs.py)

    # --- phase 6: multiopen ------------------------------------------------------
    with phase("multiopen"):
        pcs.open_all(params, dom, claims, tw, rng=rng)
    return tw.finalize()
