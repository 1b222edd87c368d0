"""Top-level pipeline API: the one-call equivalents of the reference's
bench harness steps (/root/reference/benchmarking/src/
blake2f_circuit_bench.rs:23-102): setup → keygen → prove → verify for the
EIP-152 BLAKE2f circuit, with phase timing (utils/timing.py) and SRS/key
caching (SURVEY.md §5.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from .circuit import blake2f as blake2f_circuit
from .circuit import mock
from .ops import blake2, u64
from .proof import keygen as keygen_mod
from .proof import prover, srs, verifier
from .utils.timing import Metrics, PROVE, SETUP, VERIFY


@dataclass
class Blake2fProver:
    """A ready-to-prove BLAKE2f pipeline at fixed (k, instances, rounds)."""

    built: blake2f_circuit.Blake2fCircuit
    params: srs.ParamsKZG
    pk: keygen_mod.ProvingKey
    metrics: Metrics
    mesh: object = None              # jax Mesh → multi-chip prover
    mesh_axis: object = "x"

    @property
    def n_inst(self) -> int:
        return self.built.n_inst

    def witness(self, h, m, t, f):
        return self.built.witness(h, m, t, f)

    def prove(self, h, m, t, f, seed: int = 0,
              transcript_mode: str = "v1") -> Tuple[bytes, dict]:
        """h (B,8,2), m (B,16,2), t (B,2,2), f (B,) -> (proof, instance).

        transcript_mode: "v1" (pinned native wire format) or "halo2ce"
        (the halo2-ce compatibility flavor — docs/FORMAT.md §compat)."""
        with self.metrics.phase(PROVE):
            with self.metrics.phase("prove.witness"):
                adv, inst = self.built.witness(h, m, t, f)
                # instance values cross to the host (transcript hashing);
                # advice stays device-resident
                inst = {k: np.asarray(v) for k, v in inst.items()}
            proof = prover.create_proof(self.params, self.pk, adv, inst,
                                        seed=seed, metrics=self.metrics,
                                        mesh=self.mesh,
                                        mesh_axis=self.mesh_axis,
                                        transcript_mode=transcript_mode)
        return proof, inst

    def verify(self, instance: dict, proof: bytes,
               transcript_mode: str = "v1") -> bool:
        with self.metrics.phase(VERIFY):
            ok = verifier.verify_proof(self.params, self.pk.vk, instance,
                                       proof,
                                       transcript_mode=transcript_mode)
        return ok

    def mock_check(self, h, m, t, f) -> list:
        adv, inst = self.built.witness(h, m, t, f)
        return mock.check(self.built.circ,
                          {k: np.asarray(v) for k, v in adv.items()},
                          {k: np.asarray(v) for k, v in inst.items()})


def setup_blake2f(k: int = 17, n_inst: int = 1, rounds: int = 12,
                  srs_seed: int = 0, cache_dir: Optional[str] = None,
                  echo: bool = True, mesh=None, mesh_axis="x",
                  scheme: str = "kzg") -> Blake2fProver:
    """Build circuit + SRS + keys ([Setup generation] phase).

    mesh: optional jax.sharding.Mesh — proofs then run the multi-chip
    path (sharded commits / 4-step NTT / carry-folded grand products).

    scheme: "kzg" (BN254 + SHPLONK, the reference's benchmarking crate
    path) or "ipa" (transparent setup, the reference's zcash-halo2
    criterion-bench path) — proof/pcs.py."""
    metrics = Metrics(echo=echo)
    with metrics.phase(SETUP):
        built = blake2f_circuit.Blake2fCircuit(k=k, n_inst=n_inst,
                                               rounds=rounds)
        if scheme == "ipa":
            from .proof import ipa as ipa_mod

            params = ipa_mod.setup(k, cache_dir=cache_dir)
        elif cache_dir is not None:
            params = srs.get_or_create(k, cache_dir)
        else:
            params = srs.setup(k, seed=srs_seed)
        pk = keygen_mod.keygen(params, built.circ, cache_dir=cache_dir)
    return Blake2fProver(built=built, params=params, pk=pk, metrics=metrics,
                         mesh=mesh, mesh_axis=mesh_axis)


def eip152_inputs(n_inst: int = 1):
    """The EIP-152 vector tiled to a batch (h, m, t, f arrays)."""
    v = blake2.EIP152_VECTOR
    h = np.broadcast_to(u64.from_ints(v["h"]), (n_inst, 8, 2)).copy()
    m = np.broadcast_to(u64.from_ints(v["m"]), (n_inst, 16, 2)).copy()
    t = np.broadcast_to(u64.from_ints(v["t"]), (n_inst, 2, 2)).copy()
    f = np.ones((n_inst,), bool)
    return h, m, t, f
