"""Streaming BLAKE2b gadget: multi-block chaining vs hashlib (host-only)."""

import hashlib

import numpy as np
import pytest

from zkodst_tpu import gadget


@pytest.mark.parametrize("size", [0, 1, 3, 64, 127, 128, 129, 256, 1000])
def test_digest_matches_hashlib(size):
    data = bytes((i * 7 + 3) % 256 for i in range(size))
    digest, calls = gadget.Blake2b.digest(data)
    assert digest == hashlib.blake2b(data).digest()
    assert gadget.check_chain(calls, len(data))
    assert gadget.chain_digest(calls) == digest


def test_digest_sizes():
    data = b"abc"
    for ds in (1, 20, 32, 48, 64):
        digest, calls = gadget.Blake2b.digest(data, ds)
        assert digest == hashlib.blake2b(data, digest_size=ds).digest()
        assert gadget.check_chain(calls, 3, ds)


def test_streaming_chunked_update_equivalence():
    data = bytes(range(256)) * 3
    h = gadget.Blake2b()
    for i in range(0, len(data), 37):
        h.update(data[i:i + 37])
    d1, calls1 = h.finalize()
    d2, calls2 = gadget.Blake2b.digest(data)
    assert d1 == d2 == hashlib.blake2b(data).digest()
    assert calls1 == calls2


def test_chain_check_rejects_tampering():
    data = b"x" * 300
    _, calls = gadget.Blake2b.digest(data)
    assert gadget.check_chain(calls, 300)

    bad = list(calls)
    bad[1] = gadget.BlockCall(calls[0].h, calls[1].m, calls[1].t,
                              calls[1].f, calls[1].h_out)  # broken h chain
    assert not gadget.check_chain(bad, 300)

    bad = list(calls)
    bad[0] = gadget.BlockCall(calls[0].h, calls[0].m, calls[0].t,
                              True, calls[0].h_out)  # early final flag
    assert not gadget.check_chain(bad, 300)

    assert not gadget.check_chain(calls[:-1], 300)  # missing block


def test_calls_to_arrays_padding():
    _, calls = gadget.Blake2b.digest(b"y" * 200)
    h, m, t, f = gadget.calls_to_arrays(calls, pad_to=5)
    assert h.shape == (5, 8, 2) and m.shape == (5, 16, 2)
    assert t.shape == (5, 2, 2) and f.shape == (5,)
    # padding repeats the last call
    assert np.array_equal(h[2], h[4])
