"""Key generation: vk/pk from a CircuitDef + SRS.

The `keygen_vk` / `keygen_pk` equivalent
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:54-55; SURVEY.md
§2.3 N2): fixed-column polynomials, the copy-constraint permutation, and
their commitments — all emitted as device-resident tensors.

Permutation argument (halo2-style, SURVEY.md §2.3 N10): positions (col, row)
over the ordered `perm_cols` are merged into cycles (union-find over the
CopyGroups); σ maps each position to the next in its cycle. σ polynomials
are *index maps* (col', row') resolved on device as δ^col'·ω^row' with two
gathers + one field mul — no host-side big-int table builds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..circuit.ir import CircuitDef, u64_cols_to_field
from ..ops.field import FR as DFR
from ..ops.pyfield import FR
from . import srs
from .domain import DELTA, Domain

# permutation chunk size, chosen so the chunk product constraint degree
# (2 + chunk) stays within the 4n extended domain: active·Z·∏(a+βσ+γ) has
# degree 2 + PERM_CHUNK = 4 = EXT_FACTOR (halo2's max_degree−2 rule with
# our max gate degree 4)
PERM_CHUNK = 2


@dataclass
class VerifyingKey:
    k: int
    fixed_commitments: Dict[str, tuple]
    sigma_commitments: List[tuple]
    perm_cols: List[str]
    circ: CircuitDef

    @property
    def perm_chunks(self) -> List[List[str]]:
        return [self.perm_cols[i: i + PERM_CHUNK]
                for i in range(0, len(self.perm_cols), PERM_CHUNK)]

    def hash_into(self, transcript) -> None:
        """Bind the vk into the transcript.

        v1: absorb k + every fixed/σ commitment as common values.
        halo2ce mode: absorb ONE `transcript_repr` scalar — halo2's
        `VerifyingKey::hash_into` mechanism (blake2b over a canonical vk
        serialization, wide-reduced mod r; docs/FORMAT.md §compat)."""
        if getattr(transcript, "mode", "v1") == "halo2ce":
            transcript.common_scalar(self.transcript_repr())
            return
        transcript.common_scalar(self.k)
        for name in sorted(self.fixed_commitments):
            transcript.common_point(self.fixed_commitments[name])
        for c in self.sigma_commitments:
            transcript.common_point(c)

    def transcript_repr(self) -> int:
        """One scalar binding the whole vk (halo2ce-mode hash_into)."""
        import hashlib

        from .transcript import compress_g1_halo2ce

        h = hashlib.blake2b(digest_size=64,
                            person=b"Halo2-Verify-Key")
        h.update(self.k.to_bytes(4, "little"))
        for name in sorted(self.fixed_commitments):
            h.update(name.encode())
            h.update(compress_g1_halo2ce(self.fixed_commitments[name]))
        for c in self.sigma_commitments:
            h.update(compress_g1_halo2ce(c))
        return int.from_bytes(h.digest(), "little") % FR.p


@dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_evals: Dict[str, jnp.ndarray]        # (n, 16) Montgomery
    fixed_coeffs: Dict[str, jnp.ndarray]
    sigma_maps: List[Tuple[np.ndarray, np.ndarray]]   # (colidx, rowidx)
    sigma_evals: List[jnp.ndarray]
    sigma_coeffs: List[jnp.ndarray]
    ext_selectors: Dict[str, np.ndarray]       # l0/llast/lblind/zh_inv (4n,16)
    roots: jnp.ndarray                         # ω^j table (n, 16)


def _roots_dev(dom: Domain) -> jnp.ndarray:
    """ω^j for j < n as (n,16) Montgomery limbs — one NTT of X."""
    n = dom.n
    e1 = np.zeros((n, 16), np.uint32)
    e1[1] = DFR.ONE
    return dom.ntt(jnp.asarray(e1))


def _build_sigma(circ: CircuitDef, perm_cols: List[str]):
    """Union-find over copy positions -> per-column (col', row') index maps."""
    n = circ.n
    cidx = {c: i for i, c in enumerate(perm_cols)}
    parent: Dict[int, int] = {}

    def find(a: int) -> int:
        root = a
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(a, a) != a:
            parent[a], a = root, parent[a]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    def enc(col: str, row: int) -> int:
        return cidx[col] * n + row

    members: Dict[int, bool] = {}
    for cp in circ.copies:
        assert cp.col_a in cidx and cp.col_b in cidx, \
            f"copy touches non-permutation column {cp.col_a}/{cp.col_b}"
        for ra, rb in zip(cp.rows_a.tolist(), cp.rows_b.tolist()):
            a, b = enc(cp.col_a, int(ra)), enc(cp.col_b, int(rb))
            members[a] = members[b] = True
            union(a, b)

    cycles: Dict[int, List[int]] = {}
    for pos in members:
        cycles.setdefault(find(pos), []).append(pos)

    colmap = [np.full(n, i, np.int32) for i in range(len(perm_cols))]
    rowmap = [np.arange(n, dtype=np.int32) for _ in perm_cols]
    for cyc in cycles.values():
        cyc.sort()
        for i, pos in enumerate(cyc):
            nxt = cyc[(i + 1) % len(cyc)]
            colmap[pos // n][pos % n] = nxt // n
            rowmap[pos // n][pos % n] = nxt % n
    return list(zip(colmap, rowmap))


def _circuit_fingerprint(circ: CircuitDef) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(repr((circ.k, list(circ.advice_names),
                   list(circ.instance_names),
                   [(g.name, repr(g.poly)) for g in circ.gates],
                   [(lk.name, tuple(lk.input_cols), tuple(lk.table_cols))
                    for lk in circ.lookups])).encode())
    for name in sorted(circ.fixed):
        h.update(name.encode())
        h.update(np.ascontiguousarray(circ.fixed[name]).tobytes())
    for cp in circ.copies:
        h.update(cp.col_a.encode())
        h.update(cp.col_b.encode())
        h.update(np.ascontiguousarray(cp.rows_a).tobytes())
        h.update(np.ascontiguousarray(cp.rows_b).tobytes())
    return h.hexdigest()


def keygen(params, circ: CircuitDef, msm_window: int = 13,
           cache_dir: str | None = None) -> ProvingKey:
    """Generate (or load) the proving key.

    The slow artifacts (fixed/σ commitments, σ index maps, extended-domain
    selector tables) are cached on disk keyed by a circuit fingerprint —
    the reference's params-file caching pattern (SURVEY.md §5.4) extended
    to keys. Polynomial forms are recomputed (fast NTTs) on load."""
    import os

    assert params.k == circ.k
    dom = Domain(circ.k)
    roots = _roots_dev(dom)

    # δ distinctness for the permutation cosets (SURVEY design: δ^d ∉ H for
    # 0 < d ≤ #columns ⟺ δ^d ≠ 1 since δ has odd order)
    perm_cols = (list(circ.advice_names) + list(circ.instance_names)
                 + (["cst"] if "cst" in circ.fixed else []))
    for d in range(1, len(perm_cols) + 1):
        assert pow(DELTA, d, FR.p) != 1, "DELTA order too small"

    from . import pcs

    cache_path = None
    cached = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        # commitments differ per scheme — tag the cache key
        tag = "ipa_" if pcs.is_ipa(params) else ""
        cache_path = os.path.join(
            cache_dir, f"pk_{tag}{_circuit_fingerprint(circ)}.npz")
        if os.path.exists(cache_path):
            try:
                cached = np.load(cache_path, allow_pickle=False)
                _required = ["sig_col", "sig_row", "fixed_comm_u32",
                             "fixed_comm_flag", "sigma_comm_u32",
                             "sigma_comm_flag"]
                missing = [k for k in _required if k not in cached]
                if missing:
                    raise KeyError(", ".join(missing))
            except (KeyError, ValueError, OSError) as ex:
                # old-format pk cache (pre npz-format change): regenerate
                # and overwrite rather than KeyError mid-keygen (ADVICE r4)
                print(f"# stale pk cache {cache_path} "
                      f"({type(ex).__name__}: {ex}): regenerating",
                      flush=True)
                cached = None

    fixed_names = sorted(circ.fixed)
    fixed_evals, fixed_coeffs = {}, {}
    for name in fixed_names:
        ev = u64_cols_to_field(DFR, jnp.asarray(circ.fixed[name]))
        fixed_evals[name] = ev
        fixed_coeffs[name] = dom.intt(ev)

    if cached is not None:
        sigma_maps = [(cached["sig_col"][i], cached["sig_row"][i])
                      for i in range(len(perm_cols))]
    else:
        sigma_maps = _build_sigma(circ, perm_cols)
    delta_pows = jnp.asarray(DFR.from_ints(
        [pow(DELTA, i, FR.p) for i in range(len(perm_cols))]))
    sigma_evals, sigma_coeffs = [], []
    for colmap, rowmap in sigma_maps:
        ev = DFR.mul(delta_pows[jnp.asarray(colmap)],
                     roots[jnp.asarray(rowmap)])
        sigma_evals.append(ev)
        sigma_coeffs.append(dom.intt(ev))

    if cached is not None:
        from .srs import _u32_to_ints

        def dec(pt_u32, flag):
            if not int(flag):
                return None
            return (_u32_to_ints(pt_u32[0]), _u32_to_ints(pt_u32[1]))

        fixed_comm = {
            n: dec(pt, fl) for n, pt, fl in zip(
                fixed_names, cached["fixed_comm_u32"],
                cached["fixed_comm_flag"])}
        sigma_comm = [dec(pt, fl) for pt, fl in zip(
            cached["sigma_comm_u32"], cached["sigma_comm_flag"])]
        ext_selectors = {k: cached[f"sel_{k}"]
                         for k in ("l0", "llast", "lblind", "zh_inv")}
    else:
        # one batched dispatch for all fixed columns, one for all σ
        fixed_batch = jnp.stack([fixed_evals[n] for n in fixed_names])
        fixed_pts = pcs.commit_evals_many(params, dom, fixed_batch,
                                          msm_window)
        fixed_comm = dict(zip(fixed_names, fixed_pts))
        sigma_pts = pcs.commit_evals_many(
            params, dom, jnp.stack(sigma_evals), msm_window)
        sigma_comm = list(sigma_pts)
        ext_selectors = dom.selectors_extended()
        if cache_path is not None:
            from .srs import _ints_to_u32

            def enc(pt):
                return _ints_to_u32(pt if pt is not None else (0, 0))

            np.savez_compressed(
                cache_path,
                fixed_comm_u32=np.stack([enc(fixed_comm[n])
                                         for n in fixed_names]),
                fixed_comm_flag=np.asarray(
                    [fixed_comm[n] is not None for n in fixed_names],
                    np.uint8),
                sigma_comm_u32=np.stack([enc(p) for p in sigma_comm]),
                sigma_comm_flag=np.asarray(
                    [p is not None for p in sigma_comm], np.uint8),
                sig_col=np.stack([m[0] for m in sigma_maps]),
                sig_row=np.stack([m[1] for m in sigma_maps]),
                **{f"sel_{k}": np.asarray(v)
                   for k, v in ext_selectors.items()})

    vk = VerifyingKey(k=circ.k, fixed_commitments=fixed_comm,
                      sigma_commitments=sigma_comm, perm_cols=perm_cols,
                      circ=circ)
    return ProvingKey(
        vk=vk, fixed_evals=fixed_evals, fixed_coeffs=fixed_coeffs,
        sigma_maps=sigma_maps, sigma_evals=sigma_evals,
        sigma_coeffs=sigma_coeffs,
        ext_selectors=ext_selectors, roots=roots)
