"""Typed run configuration + env plumbing (SURVEY.md §5.6).

The reference's three config mechanisms — the DEGREE env var
(/root/reference/benchmarking/src/blake2f_circuit_bench.rs:27-30), cargo
feature flags, and in-code constants — become one dataclass with env-var
defaults and a CLI front end (zkodst_tpu/__main__.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass
class RunConfig:
    """Everything a prover run needs, in one place."""

    k: int = field(default_factory=lambda: _env_int("DEGREE", 17))
    n_inst: int = field(
        default_factory=lambda: _env_int("ZKODST_BENCH_INSTANCES", 37))
    rounds: int = 12
    commitment: str = "kzg"          # KZG/BN254 + SHPLONK (BASELINE.json)
    curve: str = "bn254"
    cache_dir: Optional[str] = ".zkodst_cache"
    seed: Optional[int] = None       # None → OS-entropy blinding
    srs_seed: int = 0
    mesh_shape: Optional[Tuple[int, ...]] = None   # e.g. (8,) or (2, 4)
    mesh_axes: Tuple[str, ...] = ("chip",)
    echo: bool = True                # phase-timer prints

    def __post_init__(self):
        if self.commitment not in ("kzg", "ipa"):
            raise ValueError(
                f"unknown commitment scheme {self.commitment!r} — the two "
                "backends of the reference are 'kzg' (halo2-ce KZG/BN254 + "
                "SHPLONK, benchmarking crate) and 'ipa' (zcash-halo2 "
                "transparent IPA, circuit-crate criterion bench)")
        if self.curve != "bn254":
            raise NotImplementedError(
                "only BN254 is built (Pasta is a documented divergence — "
                "docs/FORMAT.md)")
        if self.commitment == "ipa" and self.mesh_shape is not None:
            raise NotImplementedError(
                "the IPA backend is single-chip (use KZG for mesh runs)")
        if self.mesh_shape is not None and len(self.mesh_shape) != len(
                self.mesh_axes):
            self.mesh_axes = tuple(
                f"ax{i}" for i in range(len(self.mesh_shape)))

    def make_mesh(self):
        """Build the jax Mesh (or None for single-chip)."""
        if self.mesh_shape is None:
            return None, None
        from .parallel.bootstrap import make_mesh

        mesh = make_mesh(tuple(self.mesh_shape), tuple(self.mesh_axes))
        axis = (self.mesh_axes[0] if len(self.mesh_axes) == 1
                else tuple(self.mesh_axes))
        return mesh, axis
