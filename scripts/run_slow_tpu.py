"""Heavy-compile verification flows, meant for the TPU backend (axon).

Runs the `slow`-marked test content end-to-end on the real chip: the k=17
BLAKE2f circuit witness + mock check (positive AND negative), and the toy
e2e prove/verify. The 1-core CPU on this host can't compile these graphs in
reasonable time; the TPU's remote-compile relay can (results cached in
.jax_cache_tpu).

Usage:  python scripts/run_slow_tpu.py [--skip-e2e]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import __graft_entry__ as _ge  # noqa: E402

_ge._enable_compile_cache()    # persist EVERY compile (axon: sub-second
                               # eager compiles are ~0.45 s relay RTTs)

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main() -> int:
    from zkodst_tpu.circuit import blake2f as bc
    from zkodst_tpu.circuit import mock
    from zkodst_tpu.ops import blake2, u64

    print("device:", jax.devices()[0], flush=True)

    # --- flow 3: k=17 circuit mock check, positive + negative ----------
    t0 = time.time()
    c = bc.Blake2fCircuit(k=17, n_inst=1)
    v = blake2.EIP152_VECTOR
    h = u64.from_ints(v["h"])[None]
    m = u64.from_ints(v["m"])[None]
    t = u64.from_ints(v["t"])[None]
    f = np.array([v["f"]], bool)
    adv, inst = c.witness(h, m, t, f)
    adv = {k: np.asarray(a) for k, a in adv.items()}
    inst = {k: np.asarray(a) for k, a in inst.items()}
    print(f"witness: {time.time() - t0:.0f}s", flush=True)

    pub = inst["pub"]
    outs = [int(u64.to_int(pub[bc.ROW_OUT + i])) for i in range(8)]
    expected = blake2.blake2f_py(list(v["h"]), list(v["m"]), v["t"], v["f"])
    assert outs == expected, "witness outputs != oracle"
    print("outputs match EIP-152 oracle", flush=True)

    t0 = time.time()
    fails = mock.check(c.circ, adv, inst)
    assert fails == [], [str(x) for x in fails][:8]
    print(f"mock check PASS ({time.time() - t0:.0f}s)", flush=True)

    bad = {k: a.copy() for k, a in adv.items()}
    rows = np.nonzero(bad["s1"][:, 0])[0]
    bad["s1"][rows[len(rows) // 2], 0] ^= 1
    fails = mock.check(c.circ, bad, inst)
    assert fails, "corruption went undetected"
    print(f"negative mock check PASS ({len(fails)} violations)", flush=True)

    # --- EIP-152 parameter space: f=false, rounds=0/1, batching -----------
    from zkodst_tpu.ops.blake2 import blake2f_py

    f0 = np.array([False])
    adv0, inst0 = c.witness(h, m, t, f0)
    pub0 = np.asarray(inst0["pub"])
    outs0 = [int(u64.to_int(pub0[bc.ROW_OUT + i])) for i in range(8)]
    assert outs0 == blake2f_py(list(v["h"]), list(v["m"]), v["t"], False)
    fails = mock.check(c.circ, {k: np.asarray(a) for k, a in adv0.items()},
                       {k: np.asarray(a) for k, a in inst0.items()})
    assert fails == [], "f=false mock check failed"
    print("f=false variant PASS", flush=True)

    for rr in (0, 1):
        cr = bc.Blake2fCircuit(k=17, n_inst=1, rounds=rr)
        advr, instr = cr.witness(h, m, t, f)
        pubr = np.asarray(instr["pub"])
        outsr = [int(u64.to_int(pubr[bc.ROW_OUT + i])) for i in range(8)]
        assert outsr == blake2f_py(list(v["h"]), list(v["m"]), v["t"],
                                   v["f"], rounds=rr)
        fails = mock.check(
            cr.circ, {k: np.asarray(a) for k, a in advr.items()},
            {k: np.asarray(a) for k, a in instr.items()})
        assert fails == [], f"rounds={rr} mock check failed"
        print(f"rounds={rr} variant PASS", flush=True)

    # --- batched instances (BASELINE config 3): 2 different inputs --------
    c2 = bc.Blake2fCircuit(k=17, n_inst=2)
    h2 = np.concatenate([h, h])
    m2 = np.concatenate([m, m.copy()])
    m2[1, 1] = u64.from_int(0x6162636465666768)     # different message
    t2 = np.concatenate([t, t])
    f2 = np.array([True, True])
    adv2, inst2 = c2.witness(h2, m2, t2, f2)
    pub2 = np.asarray(inst2["pub"])
    for b in range(2):
        outs_b = [int(u64.to_int(pub2[b * bc.R_PUB + bc.ROW_OUT + i]))
                  for i in range(8)]
        mm = [int(u64.to_int(m2[b, j])) for j in range(16)]
        assert outs_b == blake2f_py(list(v["h"]), mm, v["t"], True)
    fails = mock.check(c2.circ, {k: np.asarray(a) for k, a in adv2.items()},
                       {k: np.asarray(a) for k, a in inst2.items()})
    assert fails == [], "n_inst=2 mock check failed"
    print("batched n_inst=2 PASS", flush=True)

    if "--skip-e2e" in sys.argv:
        return 0

    # --- flow 4: toy-circuit e2e prove/verify ---------------------------
    import test_circuit_ir as toy
    from zkodst_tpu.proof import keygen, prover, srs, verifier

    t0 = time.time()
    circ = toy.toy_circuit()
    params = srs.setup(circ.k, seed=2)
    pk = keygen.keygen(params, circ, msm_window=4)
    print(f"toy setup+keygen: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    proof = prover.create_proof(params, pk, toy.good_witness(), {}, seed=3)
    print(f"toy prove: {time.time() - t0:.0f}s ({len(proof)} bytes)",
          flush=True)
    assert verifier.verify_proof(params, pk.vk, {}, proof), "verify failed"
    badp = bytearray(proof)
    badp[5] ^= 1
    assert not verifier.verify_proof(params, pk.vk, {}, bytes(badp)), \
        "tampered proof accepted"
    print("toy e2e prove/verify PASS (incl. tamper rejection)", flush=True)

    if "--skip-multiblock" in sys.argv:
        return 0

    # --- flow 5: multi-block gadget → prove → verify → chain-check -------
    # (tests/test_multiblock_e2e.py content, TPU-run; SURVEY.md §3.5 —
    # the reference's initialize_with_state feed-forward, enforced on the
    # PROVED public values)
    import hashlib

    from zkodst_tpu import api, gadget

    msg = b"x" * 300
    digest, calls = gadget.Blake2b.digest(msg)
    assert digest == hashlib.blake2b(msg).digest()
    assert len(calls) == 3
    t0 = time.time()
    pipe = api.setup_blake2f(k=17, n_inst=3, cache_dir=".zkodst_cache",
                             echo=False)
    print(f"multiblock setup+keygen: {time.time() - t0:.0f}s", flush=True)
    hh, mm_, tt, ff = gadget.calls_to_arrays(calls, pad_to=pipe.n_inst)
    t0 = time.time()
    proof, inst = pipe.prove(hh, mm_, tt, ff, seed=9)
    print(f"multiblock prove: {time.time() - t0:.0f}s "
          f"({len(proof)} bytes)", flush=True)
    assert pipe.verify(inst, proof), "multiblock proof failed verify"
    proved = gadget.instance_column_calls(
        pipe.built, np.asarray(inst["pub"]), 3)
    assert gadget.check_chain(proved, data_len=len(msg))
    assert gadget.chain_digest(proved) == digest
    forged = list(proved)
    c1 = forged[1]
    bad_h = tuple(x ^ 1 for x in c1.h)
    forged[1] = gadget.BlockCall(
        h=bad_h, m=c1.m, t=c1.t, f=c1.f,
        h_out=tuple(blake2.blake2f_py(list(bad_h), list(c1.m), c1.t,
                                      c1.f)))
    assert not gadget.check_chain(forged, data_len=len(msg))
    print("multi-block chain e2e PASS (proved public values; forged "
          "feed-forward rejected)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
