"""verify_proof: transcript replay + quotient identity + pairing check.

The `verify_proof::<KZG, VerifierSHPLONK, SingleStrategy>` equivalent
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:84-101; SURVEY.md
§2.3 N4). Pure host-side Python (verification is cheap by design): replays
the Blake2b transcript, evaluates the SAME constraint enumeration as the
prover at the challenge point x (proof/constraints.py), checks
numerator(x) == h(x)·(x^n − 1), and delegates the batched opening to the
SHPLONK pairing check.

Instance handling: the instance column is NOT committed — the verifier
evaluates it directly at x from the public values (Lagrange closed form
over the nonzero rows), the halo2 small-instance path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..ops import u64
from ..ops.pyfield import FR as PFR
from . import constraints, pcs, shplonk, srs
from .domain import DELTA, EXT_FACTOR, Domain
from .keygen import VerifyingKey
from .prover import query_schedule, rotation_point
from .transcript import Blake2bRead


def _instance_eval(dom: Domain, pub_u64: np.ndarray, x: int) -> int:
    """pub(x) = Σ_r pub_r · L_r(x) over nonzero rows (zeros contribute 0)."""
    p = PFR.p
    rows = np.nonzero(pub_u64.any(axis=-1))[0]
    vals = [int(u64.to_int(pub_u64[r])) for r in rows]
    zh = dom.vanishing_eval(x)
    ninv = pow(dom.n, -1, p)
    dens = [(x - pow(dom.omega, int(r), p)) % p for r in rows]
    # batch inversion
    pref = [1] * (len(dens) + 1)
    for i, d in enumerate(dens):
        pref[i + 1] = pref[i] * d % p
    inv = pow(pref[-1], -1, p) if dens else 1
    acc = 0
    for i in range(len(dens) - 1, -1, -1):
        di = pref[i] * inv % p
        inv = inv * dens[i] % p
        wi = pow(dom.omega, int(rows[i]), p)
        acc = (acc + vals[i] * wi % p * zh % p * di % p * ninv) % p
    return acc


class _PointCtx:
    """Host-int constraint evaluation at the challenge point x."""

    def __init__(self, ev: Dict, x: int, chal: Dict[str, int],
                 l0: int, llast: int, lblind: int):
        self.ev = ev
        self.x = x
        self.l0 = l0
        self.llast = llast
        self.active = (1 - llast - lblind) % PFR.p
        for name in ("theta", "beta", "gamma", "y"):
            setattr(self, name, chal[name] % PFR.p)

    def const(self, v: int) -> int:
        return v % PFR.p

    def get(self, name: str, rot: int) -> int:
        return self.ev[(name, rot)]

    def identity(self, gi: int) -> int:
        return pow(DELTA, gi, PFR.p) * self.x % PFR.p

    def add(self, a, b):
        return (a + b) % PFR.p

    def sub(self, a, b):
        return (a - b) % PFR.p

    def mul(self, a, b):
        return a * b % PFR.p


def verify_proof(params, vk: VerifyingKey,
                 instance_u64: Dict[str, np.ndarray], proof: bytes,
                 transcript_mode: str = "v1") -> bool:
    """params: srs.ParamsKZG or ipa.ParamsIPA — the multiopen check
    dispatches on the scheme (proof/pcs.py); everything before it
    (transcript replay, quotient identity) is scheme-independent.

    transcript_mode: "v1" (the pinned native wire format) or "halo2ce"
    (the compatibility flavor, docs/FORMAT.md §compat) — must match the
    prover's."""
    from .prover import absorb_instances

    circ = vk.circ
    dom = Domain(circ.k)
    n, u = dom.n, circ.usable_rows
    tr = Blake2bRead(proof, mode=transcript_mode)
    vk.hash_into(tr)
    try:
        # ValueError here = instance rows past the declared prefix in
        # halo2ce mode (unbound by Fiat–Shamir) — a clean rejection, not
        # a crash (ADVICE r4 high).
        absorb_instances(tr, circ, instance_u64)
        coms: Dict[str, tuple] = {}
        for name in circ.advice_names:
            coms[name] = tr.read_point()
        theta = tr.squeeze_challenge()
        for lk in circ.lookups:
            coms[f"{lk.name}.a_perm"] = tr.read_point()
            coms[f"{lk.name}.s_perm"] = tr.read_point()
        beta = tr.squeeze_challenge()
        gamma = tr.squeeze_challenge()
        for j in range(len(vk.perm_chunks)):
            coms[f"perm.z{j}"] = tr.read_point()
        for lk in circ.lookups:
            coms[f"{lk.name}.z"] = tr.read_point()
        y = tr.squeeze_challenge()
        for i in range(EXT_FACTOR):
            coms[f"h{i}"] = tr.read_point()
        x = tr.squeeze_challenge()

        sched = query_schedule(vk)
        ev: Dict = {}
        claims = []
        for name, rots in sched:
            pts, evs = [], []
            for r in rots:
                e = tr.read_scalar()
                ev[(name, r)] = e
                pts.append(rotation_point(dom, x, r))
                evs.append(e)
            com = vk.fixed_commitments.get(name)
            if com is None and name.startswith("perm.sigma"):
                com = vk.sigma_commitments[int(name[len("perm.sigma"):])]
            if com is None:
                com = coms[name]
            claims.append(shplonk.Claim(tuple(pts), tuple(evs),
                                        commitment=com))
        for name in circ.instance_names:
            ev[(name, 0)] = _instance_eval(
                dom, np.asarray(instance_u64[name], np.uint32), x)

        # quotient identity at x
        l0, llast, lblind = dom.l0_llast_lblind_eval(x)
        ctx = _PointCtx(ev, x, dict(theta=theta, beta=beta, gamma=gamma,
                                    y=y), l0, llast, lblind)
        numer = constraints.fold_y(
            ctx, constraints.enumerate_constraints(vk, ctx))
        xn = pow(x, n, PFR.p)
        h_at_x = 0
        for i in range(EXT_FACTOR):
            h_at_x = (h_at_x + pow(xn, i, PFR.p) * ev[(f"h{i}", 0)]) % PFR.p
        if numer % PFR.p != h_at_x * dom.vanishing_eval(x) % PFR.p:
            return False

        if not pcs.verify_all(params, dom, claims, tr):
            return False
        return tr.done()
    except (AssertionError, ValueError, KeyError, IndexError,
            OverflowError, ZeroDivisionError):
        # a malformed proof must REJECT, whatever exception the decode /
        # bookkeeping path raises (bad point encodings, truncated streams,
        # non-invertible denominators from adversarial challenges, …)
        return False
