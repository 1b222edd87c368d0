"""Evaluation domain: 2^k roots of unity, coeff<->eval transforms, extended
coset domain for the quotient, and the Lagrange-selector evaluations.

The TPU-native `halo2_proofs::poly::EvaluationDomain` (SURVEY.md §2.3 N7).
Device transforms ride :mod:`..ops.ntt`; the handful of host-side scalars
(vanishing evaluations, Lagrange coefficients at a point) use Python ints.

Conventions (matching halo2):
* base domain H = {ω^i}, |H| = n = 2^k.
* extended domain for the quotient: the coset ζ·H' with |H'| = 4n (max
  constraint degree 5 ⇒ quotient degree < 4n), ζ any element outside H'
  (we use the Fr multiplicative generator g: ζ = g).
* l_0 / l_last / l_blind: Lagrange selectors at row 0, row u = n−1−blinders,
  and the blinding rows u+1..n−1 (ir.BLINDING_ROWS).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax.numpy as jnp
import numpy as np

from ..circuit.ir import BLINDING_ROWS
from ..ops import ntt as nttmod
from ..ops.field import FR
from ..ops.pyfield import FR as PFR

# a generator of Fr^* (halo2curves Fr::MULTIPLICATIVE_GENERATOR = 7;
# validated below to have full 2-adic order, which is all we rely on)
GEN = 7
assert pow(GEN, (PFR.p - 1) // 2, PFR.p) != 1, "GEN must be a non-square"

# DELTA: generator of the odd-order quotient group used to build disjoint
# permutation-column cosets: delta = GEN^(2^S). Distinctness for small
# powers is asserted in keygen.
DELTA = pow(GEN, 1 << PFR.two_adicity, PFR.p)

EXT_FACTOR = 4   # extended domain = 4n (max constraint degree 5)


@dataclass(frozen=True)
class Domain:
    k: int

    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def usable(self) -> int:
        return self.n - BLINDING_ROWS - 1

    @cached_property
    def omega(self) -> int:
        return PFR.root_of_unity(self.k)

    @cached_property
    def omega_inv(self) -> int:
        return pow(self.omega, -1, PFR.p)

    # -- extended coset domain ------------------------------------------------
    @property
    def ext_k(self) -> int:
        return self.k + EXT_FACTOR.bit_length() - 1

    @property
    def ext_n(self) -> int:
        return self.n * EXT_FACTOR

    @cached_property
    def ext_omega(self) -> int:
        return PFR.root_of_unity(self.ext_k)

    @property
    def zeta(self) -> int:
        return GEN

    # -- device transforms (columns are (..., n, 16) Montgomery limbs) -------
    # `mesh`: route through the 4-step distributed NTT (one all-to-all over
    # `mesh_axis`; parallel/ntt_sharded.py) — the BASELINE.md config-5 path.
    # At small domains the mesh path pads every stack to the common PAD_B
    # batch (utils/compilebudget.py): the sharded transforms otherwise
    # compile one SPMD graph per distinct stack size, which is what blew
    # the dry-run stage-2 budget on the 1-core CPU hosts (VERDICT r3 #2).
    @staticmethod
    def _unified(batch, fn):
        from ..utils import compilebudget as cb

        one = batch.ndim == 2
        if one:
            batch = batch[None]
        out = cb.chunked_call(batch, fn) if cb.unify(batch.shape[-2]) \
            else fn(batch)
        return out[0] if one else out

    def ntt(self, coeffs, mesh=None, mesh_axis: str = "x"):
        if mesh is not None:
            from ..parallel.ntt_sharded import ntt_sharded_nat

            return self._unified(
                coeffs,
                lambda c: ntt_sharded_nat(FR, c, self.omega, mesh,
                                          mesh_axis))
        return nttmod.ntt(FR, coeffs, self.omega)

    def intt(self, evals, mesh=None, mesh_axis: str = "x"):
        if mesh is not None:
            from ..parallel.ntt_sharded import intt_sharded_nat

            return self._unified(
                evals,
                lambda e: intt_sharded_nat(FR, e, self.omega, mesh,
                                           mesh_axis))
        return nttmod.intt(FR, evals, self.omega)

    def coeff_to_extended(self, coeffs, mesh=None, mesh_axis: str = "x"):
        """coeffs (..., n, 16) -> evals on ζ·H' (..., 4n, 16)."""
        pad = jnp.zeros(coeffs.shape[:-2] + (self.ext_n - coeffs.shape[-2], 16),
                        jnp.uint32)
        wide = jnp.concatenate([coeffs, pad], axis=-2)
        if mesh is not None:
            from ..parallel.ntt_sharded import ntt_sharded_nat

            scaled = nttmod.coset_scale(FR, wide, self.zeta)
            return self._unified(
                scaled,
                lambda s: ntt_sharded_nat(FR, s, self.ext_omega, mesh,
                                          mesh_axis))
        return nttmod.coset_ntt(FR, wide, self.ext_omega, self.zeta)

    def extended_to_coeff(self, evals, mesh=None, mesh_axis: str = "x"):
        """evals on ζ·H' -> coefficient form (length 4n)."""
        if mesh is not None:
            from ..parallel.ntt_sharded import intt_sharded_nat

            out = self._unified(
                evals,
                lambda e: intt_sharded_nat(FR, e, self.ext_omega, mesh,
                                           mesh_axis))
            return nttmod.coset_scale(FR, out, self.zeta, inverse=True)
        return nttmod.coset_intt(FR, evals, self.ext_omega, self.zeta)

    # -- host-side scalar helpers --------------------------------------------
    def vanishing_eval(self, x: int) -> int:
        """Z_H(x) = x^n − 1."""
        return (pow(x, self.n, PFR.p) - 1) % PFR.p

    def lagrange_eval(self, i: int, x: int) -> int:
        """L_i(x) = ω^i·(x^n − 1) / (n·(x − ω^i)) for x ∉ H."""
        p = PFR.p
        wi = pow(self.omega, i, p)
        num = wi * self.vanishing_eval(x) % p
        den = self.n * (x - wi) % p
        return num * pow(den, -1, p) % p

    def l0_llast_lblind_eval(self, x: int):
        l0 = self.lagrange_eval(0, x)
        llast = self.lagrange_eval(self.usable, x)
        lblind = sum(self.lagrange_eval(i, x)
                     for i in range(self.usable + 1, self.n)) % PFR.p
        return l0, llast, lblind

    # -- extended-domain selector tables (device, computed once per keygen) --
    def _lagrange_on_extended(self, rows) -> np.ndarray:
        """Σ_{i∈rows} L_i evaluated on ζ·H' -> (4n, 16) Montgomery limbs."""
        p = PFR.p
        xs = [self.zeta * pow(self.ext_omega, j, p) % p
              for j in range(self.ext_n)]
        vals = []
        for x in xs:
            zh = self.vanishing_eval(x)
            acc = 0
            for i in rows:
                wi = pow(self.omega, i, p)
                acc = (acc + wi * zh * pow(self.n * (x - wi) % p, -1, p)) % p
            vals.append(acc)
        return FR.from_ints(vals)

    def selectors_extended(self) -> dict:
        """{l0, llast, lblind, zh_inv} on the extended coset (host, cached
        by keygen). zh_inv = 1/(x^n − 1) — nonzero on the coset."""
        p = PFR.p
        # X^n on the coset: ζ^n · (ω'^n)^j, ω'^n has order EXT_FACTOR
        zn = pow(self.zeta, self.n, p)
        wn = pow(self.ext_omega, self.n, p)
        zh = [(zn * pow(wn, j, p) - 1) % p for j in range(EXT_FACTOR)]
        zh_inv_short = [pow(v, -1, p) for v in zh]
        zh_inv = np.tile(np.asarray(FR.from_ints(zh_inv_short)),
                         (self.n, 1))
        # L_i on the coset via the closed form, vectorized host-side
        xs = np.empty(self.ext_n, dtype=object)
        acc = 1
        for j in range(self.ext_n):
            xs[j] = self.zeta * acc % p
            acc = acc * self.ext_omega % p
        zh_full = np.tile(np.array(zh, dtype=object), self.n)

        def lag_sum(rows):
            out = np.zeros(self.ext_n, dtype=object)
            for i in rows:
                wi = pow(self.omega, i, p)
                dens = [(int(x) - wi) % p for x in xs]
                # batch inversion (Montgomery's trick)
                pref = [1] * (len(dens) + 1)
                for t, d in enumerate(dens):
                    pref[t + 1] = pref[t] * d % p
                inv_all = pow(pref[-1], -1, p)
                invs = [0] * len(dens)
                for t in range(len(dens) - 1, -1, -1):
                    invs[t] = pref[t] * inv_all % p
                    inv_all = inv_all * dens[t] % p
                ninv = pow(self.n, -1, p)
                for t in range(self.ext_n):
                    out[t] = (out[t]
                              + wi * int(zh_full[t]) % p * invs[t] % p * ninv
                              ) % p
            return FR.from_ints(out)

        return {
            "l0": lag_sum([0]),
            "llast": lag_sum([self.usable]),
            "lblind": lag_sum(range(self.usable + 1, self.n)),
            "zh_inv": zh_inv,
        }
