"""Streaming BLAKE2b hash gadget over the F-compression circuit.

The L5 layer of the reference — the chip-agnostic `Blake2f` hasher with
`new/update/finalize/digest` and the `Blake2fInstructions` surface
(/root/reference/blake2f-circuit/src/blake2f.rs:40-181) — completed and
re-designed for the batched TPU circuit:

* The circuit proves the EIP-152 compression F per instance (one block per
  instance row-block). A multi-block hash is a CHAIN of instances.
* Chaining soundness is enforced on **public values**: every block's input
  state h and output state h' are instance columns, so the verifier checks
  h_{i+1} == h'_i, h_0 == the parameterized IV, t/f per RFC 7693 §3.3 —
  no in-circuit copies needed (the reference does the same feed-forward
  with `initialize_with_state`, compression.rs:1096-1110, but pays circuit
  rows for it; public chaining is free and equally binding since both ends
  are already public).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .ops import blake2, u64

BLOCK_BYTES = 128
MASK64 = 0xFFFFFFFFFFFFFFFF


@dataclass
class BlockCall:
    """One F-call: the public inputs/outputs of one circuit instance."""

    h: Tuple[int, ...]        # 8 input state words
    m: Tuple[int, ...]        # 16 message words
    t: Tuple[int, int]        # offset counter (lo, hi)
    f: bool                   # final-block flag
    h_out: Tuple[int, ...]    # 8 output state words


class Blake2b:
    """Streaming (unkeyed) BLAKE2b producing the per-block F-call trace.

    Mirrors the reference gadget's new/update/finalize surface
    (blake2f.rs:90-181); `finalize` returns (digest, [BlockCall...]) — the
    BlockCalls are exactly the instances to prove."""

    def __init__(self, digest_size: int = 64, rounds: int = 12):
        assert 1 <= digest_size <= 64
        self.digest_size = digest_size
        self.rounds = rounds
        self.h = list(blake2.IV)
        self.h[0] ^= 0x01010000 ^ digest_size
        self.h0 = tuple(self.h)
        self._buf = b""
        self._t = 0
        self._calls: List[BlockCall] = []
        self._done = False

    def update(self, data: bytes) -> "Blake2b":
        assert not self._done, "finalize() already called"
        self._buf += data
        # compress all full blocks EXCEPT a trailing exactly-full one (it
        # might be the final block, which needs f=true)
        while len(self._buf) > BLOCK_BYTES:
            self._compress(self._buf[:BLOCK_BYTES], final=False)
            self._buf = self._buf[BLOCK_BYTES:]
        return self

    def _compress(self, block: bytes, final: bool) -> None:
        self._t += len(block)
        padded = block + b"\x00" * (BLOCK_BYTES - len(block))
        m = tuple(int.from_bytes(padded[j * 8:(j + 1) * 8], "little")
                  for j in range(16))
        t = (self._t & MASK64, (self._t >> 64) & MASK64)
        h_in = tuple(self.h)
        self.h = blake2.blake2f_py(list(self.h), list(m), t, final,
                                   self.rounds)
        self._calls.append(BlockCall(h_in, m, t, final, tuple(self.h)))

    def finalize(self) -> Tuple[bytes, List[BlockCall]]:
        assert not self._done
        self._done = True
        self._compress(self._buf, final=True)
        self._buf = b""
        out = b"".join(x.to_bytes(8, "little") for x in self.h)
        return out[: self.digest_size], list(self._calls)

    @classmethod
    def digest(cls, data: bytes, digest_size: int = 64
               ) -> Tuple[bytes, List[BlockCall]]:
        return cls(digest_size).update(data).finalize()


def calls_to_arrays(calls: Sequence[BlockCall], pad_to: Optional[int] = None):
    """BlockCalls -> batched (h, m, t, f) circuit inputs (padding repeats
    the last call so the batch matches the circuit's n_inst)."""
    calls = list(calls)
    if pad_to is not None:
        assert len(calls) <= pad_to, "message needs more blocks than n_inst"
        calls = calls + [calls[-1]] * (pad_to - len(calls))
    h = u64.from_ints([c.h for c in calls])
    m = u64.from_ints([c.m for c in calls])
    t = u64.from_ints([c.t for c in calls])
    f = np.array([c.f for c in calls], bool)
    return h, m, t, f


def check_chain(calls: Sequence[BlockCall], data_len: int,
                digest_size: int = 64) -> bool:
    """Verifier-side chain rules over the PUBLIC per-block values:
    parameterized IV start, h feed-forward, RFC 7693 §3.3 t/f schedule."""
    if not calls:
        return False
    iv0 = list(blake2.IV)
    iv0[0] ^= 0x01010000 ^ digest_size
    if calls[0].h != tuple(iv0):
        return False
    nblocks = max(1, (data_len + BLOCK_BYTES - 1) // BLOCK_BYTES)
    if len(calls) != nblocks:
        return False
    for i, c in enumerate(calls):
        last = i == nblocks - 1
        if c.f != last:
            return False
        expect_t = data_len if last else (i + 1) * BLOCK_BYTES
        if c.t != (expect_t & MASK64, (expect_t >> 64) & MASK64):
            return False
        if i > 0 and c.h != calls[i - 1].h_out:
            return False
    return True


def chain_digest(calls: Sequence[BlockCall], digest_size: int = 64) -> bytes:
    out = b"".join(x.to_bytes(8, "little") for x in calls[-1].h_out)
    return out[:digest_size]


def instance_column_calls(built, pub: np.ndarray, n_blocks: int
                          ) -> List[BlockCall]:
    """Recover BlockCalls from a proved instance column (the verifier reads
    public values straight out of `pub` at the known layout rows)."""
    from .circuit import blake2f as bc

    calls = []
    for i in range(n_blocks):
        base = i * bc.R_PUB
        word = lambda r: int(u64.to_int(pub[base + r]))  # noqa: E731
        calls.append(BlockCall(
            h=tuple(word(bc.ROW_H + j) for j in range(8)),
            m=tuple(word(bc.ROW_M + j) for j in range(16)),
            t=(word(bc.ROW_T), word(bc.ROW_T + 1)),
            f=bool(word(bc.ROW_F)),
            h_out=tuple(word(bc.ROW_OUT + j) for j in range(8)),
        ))
    return calls
