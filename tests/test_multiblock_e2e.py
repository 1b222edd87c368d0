"""Multi-block message: gadget → chained instances → prove → verify →
chain-check on the PROVED public values.

Closes the loop the reference enforces in-circuit via
`initialize_with_state` feed-forward
(/root/reference/blake2f-circuit/src/blake2f/table16/compression.rs:
1096-1110, SURVEY.md §3.5): here every block's h/h' is public, so the
verifier checks the chain rules (IV start, h feed-forward, t/f schedule)
over the instance column the proof verified against — equally binding,
zero extra circuit rows.

Heavy-compile (k=17): slow-marked, TPU-run (RUN_SLOW=1 or scripts/).
"""

import hashlib

import numpy as np
import pytest

from zkodst_tpu import gadget

pytestmark = pytest.mark.slow

MSG = b"x" * 300          # 3 blocks (128 + 128 + 44 bytes)


def test_multiblock_prove_verify_chain():
    from zkodst_tpu import api
    from zkodst_tpu.circuit import blake2f as bc

    digest, calls = gadget.Blake2b.digest(MSG)
    assert digest == hashlib.blake2b(MSG).digest()
    assert len(calls) == 3

    pipe = api.setup_blake2f(k=17, n_inst=3, cache_dir=".zkodst_cache",
                             echo=False)
    h, m, t, f = gadget.calls_to_arrays(calls, pad_to=pipe.n_inst)
    proof, inst = pipe.prove(h, m, t, f, seed=9)
    assert pipe.verify(inst, proof)

    # recover the per-block calls from the PROVED instance column and run
    # the verifier-side chain rules against them
    pub = np.asarray(inst["pub"])
    proved_calls = gadget.instance_column_calls(pipe.built, pub, 3)
    assert gadget.check_chain(proved_calls, data_len=len(MSG))
    assert gadget.chain_digest(proved_calls) == digest

    # tampered chaining must be caught: a forged middle-block input state
    # breaks the h feed-forward rule even though each F-call is internally
    # consistent
    forged = list(proved_calls)
    c1 = forged[1]
    bad_h = tuple(x ^ 1 for x in c1.h)
    from zkodst_tpu.ops import blake2

    forged[1] = gadget.BlockCall(
        h=bad_h, m=c1.m, t=c1.t, f=c1.f,
        h_out=tuple(blake2.blake2f_py(list(bad_h), list(c1.m), c1.t, c1.f)))
    assert not gadget.check_chain(forged, data_len=len(MSG))
