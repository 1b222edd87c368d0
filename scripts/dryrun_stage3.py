"""Multichip dry-run stage 3: the sharded prove past its minimum config.

Round-4 verdict (#4): stage 2 proves k=5 over 4 devices — the smallest
possible configuration. This stage drives the analogous prove (k=6: the
smallest degree the 4-step NTT can factor over 8 devices; same toy
circuit family, SRS seed, blinding seed, its own committed golden) over
the shapes that
config 5 actually claims:

  3a  full 1-D mesh over ALL n devices (default 8) — the round-3 k=6
      variant never finished on one core (unique SPMD graphs + 8
      spin-waiting device threads); the small-domain msm_small path and
      the committed .jax_cache entries have since tamed both causes;
  3b  2-D ("host", "chip") = (2, n/2) mesh with a TUPLE mesh axis — the
      pod-slice shape from parallel/bootstrap.py (hosts on DCN, chips on
      ICI); previously unit-tested only (tests/test_sharded_prover.py);
  3c  proof-level DP: two DISJOINT 4-device meshes prove two proofs
      CONCURRENTLY (threads; independent device groups) — the "whole
      independent proofs sharded across chips" row of SURVEY.md §2.4.

Each sub-stage byte-checks against tests/golden/dryrun_proof_k6_v1.json
and verifies. A deadline (ZKODST_DRYRUN_BUDGET semantics, passed as
argv[2] seconds) skips remaining sub-stages cleanly — evidence already
printed stands; a genuine mismatch still fails the process.

Sub-stage 3c runs in a FRESH subprocess: after 3a + 3b this process
holds hundreds of JIT'd executables and their mappings, and the two
extra device-assignment executables of 3c pushed the process past the
kernel's vm.max_map_count (65530) — LLVM "Cannot allocate memory" with
>100 GB free, then a segfault in libgcc unwinding (observed twice in
round 5). A clean process has map headroom.

Usage: python scripts/dryrun_stage3.py [n_platform_devices] [budget_s]
       [all|ab|c]
"""

import json
import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0
MODE = sys.argv[3] if len(sys.argv) > 3 else "all"
# k=6: the 4-step sharded NTT factors n = n1 x n2 with ndev | n1 and
# ndev | n2, so the 8-device stages need n >= 64 (k=5's n=32 cannot
# shard over 8 devices at all -- the honest minimum for this stage)
K = 6
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
if f"--xla_force_host_platform_device_count={N}" not in \
        os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402

ge._enable_compile_cache()

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

assert len(jax.devices()) >= N and jax.devices()[0].platform == "cpu", \
    (jax.devices(), "stage 3 needs a CPU platform")

from zkodst_tpu.proof import keygen, prover, srs, verifier  # noqa: E402

_T0 = time.time()


def _remaining() -> float:
    return BUDGET - (time.time() - _T0)


def main() -> None:
    circ, witness = ge._toy_circuit_k(K)
    cache_dir = os.path.join(REPO, "tests", "golden", "dryrun_cache")
    params = srs.get_or_create(K, cache_dir, seed=2)
    pk = keygen.keygen(params, circ, cache_dir=cache_dir)
    with open(os.path.join(REPO, "tests", "golden",
                           f"dryrun_proof_k{K}_v1.json")) as fh:
        golden = json.load(fh)["proof_hex"]
    print(f"stage 3 setup done ({time.time() - _T0:.0f}s)", flush=True)

    def check(proof: bytes, what: str) -> None:
        assert proof.hex() == golden, (
            f"{what}: proof diverged from the committed single-chip golden")
        assert verifier.verify_proof(params, pk.vk, {}, proof), \
            f"{what}: proof failed verification"

    if MODE in ("all", "ab"):
        # --- 3a: full 1-D mesh over all N devices -----------------------
        if _remaining() < 60:
            print("dryrun stage 3a SKIPPED: budget", flush=True)
            return
        mesh_full = Mesh(np.array(jax.devices()[:N]), axis_names=("dp",))
        proof = prover.create_proof(params, pk, witness, {}, seed=11,
                                    mesh=mesh_full, mesh_axis="dp")
        check(proof, "stage 3a")
        print(f"dryrun stage 3a PASS: full k={K} sharded prove over ALL "
              f"{N} devices — byte-identical to the golden, verify OK "
              f"({time.time() - _T0:.0f}s)", flush=True)

        # --- 3b: 2-D (host, chip) mesh, tuple mesh axis -----------------
        if _remaining() < 60:
            print("dryrun stage 3b SKIPPED: budget", flush=True)
            return
        from zkodst_tpu.parallel.bootstrap import make_mesh

        mesh_2d = make_mesh((2, N // 2), ("host", "chip"))
        proof = prover.create_proof(params, pk, witness, {}, seed=11,
                                    mesh=mesh_2d,
                                    mesh_axis=("host", "chip"))
        check(proof, "stage 3b")
        print(f"dryrun stage 3b PASS: full k={K} sharded prove over a 2-D "
              f"(host,chip)=(2,{N // 2}) mesh (tuple axis) — "
              f"byte-identical, verify OK ({time.time() - _T0:.0f}s)",
              flush=True)

    if MODE == "ab":
        return
    if MODE == "all":
        # 3c in a fresh subprocess (see module docstring: map-count
        # headroom); budget whatever remains
        import subprocess

        rem = _remaining()
        if rem < 90:
            print("dryrun stage 3c SKIPPED: budget", flush=True)
            return
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(N),
                 str(rem - 10), "c"],
                env=dict(os.environ), cwd=REPO, timeout=rem,
                capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print("dryrun stage 3c TIMEOUT (3a/3b evidence stands)",
                  flush=True)
            return
        for line in res.stdout.splitlines():
            if line.startswith("dryrun stage 3c"):
                print(line, flush=True)
        if res.returncode != 0:
            raise RuntimeError(
                f"dryrun stage 3c FAILED (rc={res.returncode}):\n"
                f"{(res.stdout + res.stderr)[-1500:]}")
        return

    # --- MODE == "c": proof-level DP — two disjoint meshes, two
    # concurrent proofs ---------------------------------------------------
    if _remaining() < 60:
        print("dryrun stage 3c SKIPPED: budget", flush=True)
        return
    import threading

    half = N // 2
    meshes = [Mesh(np.array(jax.devices()[:half]), axis_names=("dp",)),
              Mesh(np.array(jax.devices()[half:N]), axis_names=("dp",))]
    # One ProvingKey per device group: create_proof lazily caches
    # device-resident static tensors (extended fixed/σ tables, chunk
    # tables) on the FIRST mesh it proves with, so sharing one pk across
    # disjoint meshes mixes device assignments (observed: "incompatible
    # devices ... ids [4,5,6,7] vs [0,1,2,3]"). Real proof-level DP
    # deployments hold one pk per group anyway.
    pks = [pk, keygen.keygen(params, pk.vk.circ,
                             cache_dir=os.path.join(
                                 REPO, "tests", "golden", "dryrun_cache"))]
    # The two device groups have different device assignments, hence two
    # DISTINCT executables per graph: pre-warm each mesh SEQUENTIALLY so
    # the concurrent proves below hit the in-process caches — two
    # concurrent cold compile storms on this host took LLVM down with
    # allocation failures (round-5 cold run: rc=139).
    for i in (0, 1):
        check(prover.create_proof(params, pks[i], witness, {}, seed=11,
                                  mesh=meshes[i], mesh_axis="dp"),
              f"stage 3c warm-up group {i}")
        if _remaining() < 60:
            print("dryrun stage 3c SKIPPED: budget (after warm-up)",
                  flush=True)
            return
    proofs: list = [None, None]
    errs: list = [None, None]

    def run(i: int) -> None:
        try:
            proofs[i] = prover.create_proof(params, pks[i], witness, {},
                                            seed=11, mesh=meshes[i],
                                            mesh_axis="dp")
        except Exception as ex:  # noqa: BLE001 — surfaced below
            errs[i] = ex

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=max(30.0, _remaining()))
    concurrent_s = time.time() - t0
    for i in range(2):
        if errs[i] is not None:
            raise errs[i]
        assert proofs[i] is not None, f"stage 3c proof {i} did not finish"
        check(proofs[i], f"stage 3c group {i}")
    print(f"dryrun stage 3c PASS: proof-level DP — 2 disjoint {half}-device "
          f"meshes proved 2 proofs concurrently in {concurrent_s:.0f}s, "
          f"both byte-identical + verified ({time.time() - _T0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
