"""Multichip dry-run stage 2: the FULL sharded prove, vs the golden.

Run by __graft_entry__.dryrun_multichip in a deadline-guarded subprocess
(a cold-machine compile overrun must not take down the in-process stage-1
evidence). Runs create_proof(mesh=...) over the toy circuit — sharded
Pippenger commits, 4-step all-to-all NTTs, carry-folded grand-product
scans — and asserts the proof bytes equal the COMMITTED single-chip
golden (tests/golden/dryrun_proof_k5_v1.json), then verifies it.

Configuration is pinned to tests/test_sharded_prover.py's (k=5 toy
circuit, seed-2 SRS, seed-11 blinding, 4-device mesh on the 8-virtual-
device CPU platform): every compiled graph is shared with the pytest
suite and the committed .jax_cache, the combination that demonstrably
completes on a 1-core host. (Round 3 ran k=6 over all 8 devices: its
unique SPMD graphs + 8 spin-waiting device threads on one core never
finished in any recorded run — VERDICT r3 #2.) SRS/pk artifacts load
from the committed disk cache (tests/golden/dryrun_cache/) so no keygen
commitments compile here.

Usage: python scripts/dryrun_stage2.py [n_platform_devices]
"""

import json
import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MESH_N = min(4, N)
K = 5
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
if f"--xla_force_host_platform_device_count={N}" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N}")

import jax  # noqa: E402

# the env var alone does NOT override site-hooked backends (the axon
# plugin of the TPU dev host registers over it); the config update does
jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402

ge._enable_compile_cache()

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

assert len(jax.devices()) >= MESH_N and \
    jax.devices()[0].platform == "cpu", \
    (jax.devices(), "stage 2 needs a CPU platform")

from zkodst_tpu.proof import keygen, prover, srs, verifier  # noqa: E402


def main() -> None:
    t0 = time.time()
    circ, witness = ge._toy_circuit_k(K)
    cache_dir = os.path.join(REPO, "tests", "golden", "dryrun_cache")
    params = srs.get_or_create(K, cache_dir, seed=2)
    pk = keygen.keygen(params, circ, cache_dir=cache_dir)
    print(f"stage 2 setup done ({time.time() - t0:.0f}s)", flush=True)

    devs = np.array(jax.devices()[:MESH_N])
    mesh = Mesh(devs, axis_names=("dp",))
    proof = prover.create_proof(params, pk, witness, {}, seed=11,
                                mesh=mesh, mesh_axis="dp")
    golden_path = os.path.join(REPO, "tests", "golden",
                               f"dryrun_proof_k{K}_v1.json")
    with open(golden_path) as fh:
        golden = json.load(fh)
    assert proof.hex() == golden["proof_hex"], \
        "sharded proof diverged from the committed single-chip golden bytes"
    assert verifier.verify_proof(params, pk.vk, {}, proof), \
        "sharded proof failed verification"
    print(f"dryrun stage 2 PASS: full k={K} sharded prove over {MESH_N} "
          f"devices — proof byte-identical to the single-chip golden, "
          f"verify OK ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
