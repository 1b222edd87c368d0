"""Spread encoding + the three lookup tables.

The "spread" of an m-bit value interleaves a zero above every bit (bit i
moves to bit 2i) — the encoding that turns XOR/AND into field addition
(reference: /root/reference/blake2f-circuit/src/blake2f/table16/
spread_table.rs:574-600 and util.rs:61-75; SURVEY.md §2.2).

Re-design vs the reference: instead of one 2^16 table with a range *tag*
column (+ witnessed tags and tag-range gates), we use three separate
(dense, spread) tables at widths 16/8/15 — dedicated input columns per
width make the tag machinery unnecessary (ir.py Lookup).
"""

from __future__ import annotations

import numpy as np


def spread16(x):
    """Interleave zeros into the odd bit positions: 16-bit -> 32-bit.

    Works on numpy or jax uint32 arrays (classic Morton bit-twiddle)."""
    m = x.__class__ if isinstance(x, np.ndarray) else None
    u = np.uint32
    x = x & u(0xFFFF)
    x = (x | (x << u(8))) & u(0x00FF00FF)
    x = (x | (x << u(4))) & u(0x0F0F0F0F)
    x = (x | (x << u(2))) & u(0x33333333)
    x = (x | (x << u(1))) & u(0x55555555)
    del m
    return x


def spread_int(v: int) -> int:
    """Host-side spread of an arbitrary-width Python int."""
    out = 0
    i = 0
    while v:
        out |= (v & 1) << (2 * i)
        v >>= 1
        i += 1
    return out


def table_u64(bits: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(dense, spread) table columns for width `bits`, padded to n rows.

    Rows beyond 2^bits repeat the last entry (a table is a set)."""
    size = 1 << bits
    assert size <= n, f"2^{bits} table needs k >= {bits}"
    dense32 = np.arange(size, dtype=np.uint32)
    spread32 = spread16(dense32)
    d = np.zeros((n, 2), np.uint32)
    s = np.zeros((n, 2), np.uint32)
    d[:size, 0] = dense32
    s[:size, 0] = spread32
    d[size:, 0] = dense32[-1]
    s[size:, 0] = spread32[-1]
    return d, s
