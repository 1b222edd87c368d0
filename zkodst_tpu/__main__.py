"""CLI front end: `python -m zkodst_tpu <command>` (SURVEY.md §5.6).

Commands mirror the reference's harness entry points:

  prove    full setup → prove → verify at the configured degree
           (blake2f_circuit_bench.rs:23-102), prints the metrics JSON
  mock     witness generation + MockProver-equivalent constraint check
  vectors  the EIP-152 appendix vector suite through the JAX path
  bench    the driver benchmark (delegates to bench.py's logic)
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--k", type=int, default=None, help="circuit degree "
                   "(2^k rows; default DEGREE env or 17)")
    p.add_argument("--instances", type=int, default=None,
                   help="BLAKE2f instances per proof")
    p.add_argument("--rounds", type=int, default=12)
    p.add_argument("--cache-dir", default=".zkodst_cache")
    p.add_argument("--seed", type=int, default=None,
                   help="deterministic blinding seed (default: OS entropy)")
    p.add_argument("--mesh", default=None,
                   help="mesh shape, e.g. '8' or '2x4' (multi-chip prover)")
    p.add_argument("--commitment", default="kzg", choices=("kzg", "ipa"),
                   help="polynomial commitment scheme: kzg (BN254+SHPLONK, "
                        "the reference's benchmarking path) or ipa "
                        "(transparent setup, the zcash-halo2 path)")
    p.add_argument("--transcript-mode", default="v1",
                   choices=("v1", "halo2ce"),
                   help="transcript flavor: v1 (pinned native format) or "
                        "halo2ce (halo2-ce compatibility — per-value "
                        "instance absorption; docs/FORMAT.md §compat)")
    p.add_argument("--quiet", action="store_true")


def _config(args):
    from .config import RunConfig

    kw = {}
    if args.k is not None:
        kw["k"] = args.k
    if args.instances is not None:
        kw["n_inst"] = args.instances
    if args.mesh:
        kw["mesh_shape"] = tuple(int(x) for x in args.mesh.split("x"))
        kw["mesh_axes"] = ("host", "chip")[-len(kw["mesh_shape"]):]
    return RunConfig(rounds=args.rounds, cache_dir=args.cache_dir,
                     seed=args.seed, echo=not args.quiet,
                     commitment=getattr(args, "commitment", "kzg"), **kw)


def cmd_prove(args) -> int:
    from . import api

    cfg = _config(args)
    mesh, axis = cfg.make_mesh()
    pipe = api.setup_blake2f(k=cfg.k, n_inst=cfg.n_inst, rounds=cfg.rounds,
                             cache_dir=cfg.cache_dir, echo=cfg.echo,
                             mesh=mesh, mesh_axis=axis or "x",
                             scheme=cfg.commitment)
    h, m, t, f = api.eip152_inputs(pipe.n_inst)
    mode = getattr(args, "transcript_mode", "v1")
    proof, inst = pipe.prove(h, m, t, f, seed=cfg.seed,
                             transcript_mode=mode)
    ok = pipe.verify(inst, proof, transcript_mode=mode)
    print(pipe.metrics.to_json())
    print(json.dumps({"proof_bytes": len(proof), "verified": bool(ok)}))
    return 0 if ok else 1


def cmd_mock(args) -> int:
    import numpy as np

    from . import api
    from .circuit import mock

    cfg = _config(args)
    pipe_cls = api.blake2f_circuit.Blake2fCircuit
    built = pipe_cls(k=cfg.k, n_inst=cfg.n_inst, rounds=cfg.rounds)
    h, m, t, f = api.eip152_inputs(cfg.n_inst)
    adv, inst = built.witness(h, m, t, f)
    fails = mock.check(built.circ, {k: np.asarray(v) for k, v in adv.items()},
                       {k: np.asarray(v) for k, v in inst.items()})
    for fl in fails:
        print(fl, file=sys.stderr)
    print(json.dumps({"constraints_ok": not fails, "k": cfg.k,
                      "instances": cfg.n_inst}))
    return 1 if fails else 0


def cmd_vectors(args) -> int:
    import numpy as np

    from .ops import blake2, u64

    bad = 0
    for v in blake2.EIP152_VECTORS:
        if "error" in v:
            try:
                blake2.eip152_decode(v["input"])
                bad += 1
                status = "FAIL (accepted malformed input)"
            except ValueError:
                status = "ok (rejected)"
        elif v["expected"] is None:
            status = "ok (decode-only)"
        else:
            rounds, h, m, t, f = blake2.eip152_decode(v["input"])
            out = blake2.blake2f(u64.from_ints(h)[None],
                                 u64.from_ints(m)[None],
                                 u64.from_ints(t)[None],
                                 np.asarray([f]), rounds)
            got = b"".join(int(x).to_bytes(8, "little")
                           for x in u64.to_ints(np.asarray(out)[0])).hex()
            status = "ok" if got == v["expected"] else f"FAIL: {got}"
            bad += status != "ok"
        print(f"vector {v['n']}: {status}")
    return 1 if bad else 0


def cmd_bench(args) -> int:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="zkodst_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("prove", cmd_prove), ("mock", cmd_mock),
                     ("vectors", cmd_vectors), ("bench", cmd_bench)):
        p = sub.add_parser(name)
        _add_common(p)
        p.set_defaults(fn=fn)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
