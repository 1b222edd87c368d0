"""Commitment-scheme dispatch: KZG/SHPLONK vs IPA behind one interface.

The reference carries TWO proof-system backends (SURVEY.md §1 L0/L0′):
zcash-halo2 IPA/Pasta for the circuit crate's criterion bench
(/root/reference/blake2f-circuit/benches/blake2f.rs:83-151) and halo2-ce
KZG/BN254+SHPLONK for the E2E bench harness
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:49-101). This
module is the seam that lets the SAME `create_proof`/`verify_proof`
pipeline (proof/prover.py, proof/verifier.py) run over either scheme —
the halo2 `CommitmentScheme` trait role.

Scheme differences handled here:
* KZG commits evaluation-form polynomials directly against the Lagrange
  SRS basis; IPA params carry only the monomial generator vector, so
  eval-form commits go through one batched iNTT first (⟨iNTT(e), G⟩ —
  the basis change is linear, so this is the same group element a
  Lagrange generator set would produce).
* Multiopen: KZG uses SHPLONK (two witness points, one pairing check);
  IPA flattens the (poly, rotations) claims into per-(poly, point) claims
  and runs the per-point RLC'd Bulletproofs-style opening (proof/ipa.py).
* Commitment blinds: the IPA path commits with Pedersen blind 0 — hiding
  comes from the BLINDING_ROWS random tail rows every committed column
  already carries (prover.py `blind_tail`), plus the per-round l/m blinds
  inside the opening argument. Documented divergence from halo2 0.3's
  nonzero per-commitment blinds (docs/FORMAT.md).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import curve, msm
from . import ipa, shplonk, srs
from .domain import Domain


def is_ipa(params) -> bool:
    return isinstance(params, ipa.ParamsIPA)


def commit_evals_many(params, dom: Domain, evals_batch, c: int,
                      mesh=None, mesh_axis: str = "x",
                      body_bits: Optional[int] = None,
                      tail_rows: int = 0) -> List:
    """Commit B evaluation-form polynomials -> list of B affine points.

    body_bits/tail_rows (small-scalar MSM split) only apply to the KZG
    Lagrange-basis path; the IPA path iNTTs first, which destroys any
    scalar smallness."""
    if is_ipa(params):
        assert mesh is None, "IPA backend is single-chip (use KZG for mesh)"
        from ..utils import compilebudget as cb

        cfs = dom.intt(evals_batch)
        if cb.unify(dom.n):
            accs = cb.chunked_call(
                cfs, lambda x: msm.msm_small_many_mont(
                    jnp.asarray(params.g), x))
        else:
            accs = msm.msm_many_mont(jnp.asarray(params.g), cfs, c)
        return curve.to_affine_ints(np.asarray(accs))
    return srs.commit_lagrange_many(params, evals_batch, c, mesh=mesh,
                                    mesh_axis=mesh_axis,
                                    body_bits=body_bits,
                                    tail_rows=tail_rows)


def commit_coeff_many(params, coeffs_batch, c: int, mesh=None,
                      mesh_axis: str = "x") -> List:
    """Commit B coefficient-form polynomials -> list of B affine points."""
    if is_ipa(params):
        assert mesh is None, "IPA backend is single-chip (use KZG for mesh)"
        from ..utils import compilebudget as cb

        m = coeffs_batch.shape[1]
        if cb.unify(m):
            accs = cb.chunked_call(
                coeffs_batch,
                lambda x: msm.msm_small_many_mont(jnp.asarray(params.g[:m]),
                                                  x))
        else:
            accs = msm.msm_many_mont(jnp.asarray(params.g[:m]),
                                     coeffs_batch, c)
        return curve.to_affine_ints(np.asarray(accs))
    return srs.commit_coeff_many(params, coeffs_batch, c, mesh=mesh,
                                 mesh_axis=mesh_axis)


def open_all(params, dom: Domain, claims: List[shplonk.Claim], tw,
             rng=None) -> None:
    """Prover-side multiopen (claims carry `evals_dev`; the IPA path also
    reuses them for the eval-form h/L passes).

    Both schemes now run the SAME BDFG20/SHPLONK reduction to a single
    final check: KZG finishes with two witness commitments + a pairing,
    IPA with one commitment + ONE log-size opening
    (ipa.open_claims_compressed — round 2's per-point RLC did ~5
    independent n-point openings per proof, measured 81 s of an 89 s
    k=17 IPA prove)."""
    if is_ipa(params):
        ipa.open_claims_compressed(params, dom, claims, tw, rng=rng)
        return
    shplonk.open_claims(params, dom, claims, tw)


def verify_all(params, dom: Domain, claims: List[shplonk.Claim],
               tr) -> bool:
    """Verifier-side multiopen check (claims carry `commitment`)."""
    if is_ipa(params):
        return ipa.verify_claims_compressed(params, dom, claims, tr)
    return shplonk.verify_claims(params, dom, claims, tr)
