"""Driver benchmark: one JSON line with the headline metric.

Current headline: batched BLAKE2f (EIP-152) compressions/second on the chip —
the witness-generation hot loop (BASELINE.md config 3). vs_baseline is the
speedup over the single-thread Python-int oracle (`blake2f_py`), standing in
for the reference's (never-recorded) CPU numbers per BASELINE.md.

Upgraded to full proofs/sec as the prover pipeline lands.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from zkodst_tpu.ops import blake2, u64

    v = blake2.EIP152_VECTOR
    B = 8192
    h = np.broadcast_to(u64.from_ints(v["h"]), (B, 8, 2))
    m = np.broadcast_to(u64.from_ints(v["m"]), (B, 16, 2))
    t = np.broadcast_to(u64.from_ints(v["t"]), (B, 2, 2))
    f = np.ones((B,), np.bool_)

    step = jax.jit(lambda h, m, t, f: blake2.blake2f(h, m, t, f, 12))
    step(h, m, t, f).block_until_ready()  # compile
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(h, m, t, f)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    tput = B / dt

    # Python-int oracle baseline (single thread), small sample.
    hs, ms = list(v["h"]), list(v["m"])
    n_py = 50
    t0 = time.perf_counter()
    for _ in range(n_py):
        blake2.blake2f_py(hs, ms, v["t"], v["f"])
    py_tput = n_py / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "blake2f_witness_throughput",
        "value": round(tput, 1),
        "unit": "compressions/s",
        "vs_baseline": round(tput / py_tput, 2),
    }))


if __name__ == "__main__":
    main()
