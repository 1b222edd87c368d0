"""The BLAKE2f circuit: spread-XOR arithmetization, TPU-first layout.

Implements the capability of the reference's table16 chip stack
(/root/reference/blake2f-circuit/src/blake2f/table16{.rs,/compression.rs,
/compression/compression_gate.rs} — SURVEY.md §2.2), re-derived from RFC
7693 / EIP-152 semantics with correct constraint algebra (the reference's
gate algebra is demonstrably buggy, SURVEY.md §2.1/§2.5). Core technique is
the same spread encoding: each 64-bit word is 4×16-bit dense limbs plus
4×32-bit spread limbs; XOR = spread addition split into even/odd parts;
rotations by 32/16 are limb relabelings; rot-24 splits one limb 8/8 and
rot-63 splits the top limb 15/1 (the reference's EfghVar/IjklVar splits,
compression.rs:135-282, reworked: the 1/15 split must be on the TOP limb's
high bit for >>>63, not the low limb).

TPU-first re-design (SURVEY.md §7):

* **No layouter.** One `_schedule` function expresses the whole compression
  as a sequence of ops; it runs twice over two backends that can never
  drift apart:
  - `_Layout` (host, once per circuit shape): allocates rows, records cell
    placements, copy constraints, selector rows, recompose coefficients.
  - `_Numeric` (pure JAX, batched): computes every witness cell value as a
    flat "stream", vectorized over instances.
  Witness generation is then: run `_Numeric` (jit/vmap-free — ops are
  elementwise over the batch axis), gather the stream into column tensors
  with precomputed static indices.
* **No range tags.** Separate 16/8/15-bit (dense, spread) tables with
  dedicated input columns replace the reference's tag column + tag gates
  (spread_table.rs:213-222).
* Row layout per instance is a contiguous block; instances tile vertically.

Row types (selector fires at the op's first row):

  DEC  (2 rows)  word -> 4 dense+spread limb pairs (d0/s0, d1/s1), word
                 copied into `w`@r0. Gate: w = Σ limb_i 2^16i.
  ADD  (2 rows)  r = u+v+x mod 2^64. Operand words copied to ca,cb,cc@r0;
                 carry in ce@r0; result pairs like DEC; result word in
                 w@r1. Gates: ca+cb+cc = w₊₁ + ce·2^64 ; w₊₁ = Σ limbs ;
                 ce∈{0,1,2}.
  XOR  (1 row per limb) operand spreads copied to ca,cb; odd pair in d0/s0,
                 even pair (the XOR limb) in d1/s1.
                 Gate: ca+cb = s1 + 2·s0  (unique by spread-validity of both
                 outputs, enforced by the 16-bit lookups).
  RCP  (1 row)   word w = Σ kⱼ·pieceⱼ for ≤5 copied pieces (ca..cf), kⱼ
                 from fixed coefficient columns — one gate covers all
                 rotation recompositions and the plain limb recompose.
  S88  (2 rows)  split a 16-bit limb spread into two 8-bit pieces (d8/s8
                 rows r, r+1). Gate: ca = s8 + 4⁸·s8₊₁.
  S115 (1 row)   split the top limb as lo15 + bit·2^15 (d15/s15 + cb bit).
                 Gates: ca = s15 + 4¹⁵·cb ; cb boolean.
  V14  (1 row)   v14 = IV6 ⊕ (f·2^64-1): four spread cells cb..cf as linear
                 selects between constant spreads; ca = f (boolean).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field as dfield
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.blake2 import G_INDICES, IV, SIGMA
from .expr import Const, V
from .ir import BLINDING_ROWS, CircuitDef, CopyGroup, Gate, Lookup
from .spread import spread16, spread_int, table_u64

# instance ("pub") column layout, per instance block
ROW_T = 0          # rows 0,1: t0, t1
ROW_F = 2
ROW_H = 3          # rows 3..10: h[0..7]
ROW_M = 11         # rows 11..26: m[0..15]
ROW_OUT = 27       # rows 27..34: h'[0..7]
R_PUB = 35

ADVICE = ["d0", "s0", "d1", "s1", "d8", "s8", "d15", "s15",
          "ca", "cb", "cc", "ce", "cf", "w"]
SELECTORS = ["q_dec", "q_add", "q_xor", "q_rcp", "q_s88", "q_s115", "q_v14"]
KCOLS = ["k1", "k2", "k3", "k4", "k5"]
RCP_CELLS = ["ca", "cb", "cc", "ce", "cf"]

_M16 = np.uint32(0xFFFF)


@dataclass
class WordH:
    """A 64-bit word's circuit representation (any subset may exist).

    Layout backend: fields hold cell handles; Numeric backend: value arrays
    (word (...,2) u64 pair, dense/spread (...,4) uint32)."""

    word: object = None
    dense: object = None
    spread: object = None


@dataclass(frozen=True)
class CellH:
    """Layout cell handle. idx = witness-stream index (None for constants
    in the `cst` fixed column, which carry `value` instead)."""

    col: str
    row: int
    idx: Optional[int] = None
    value: Optional[int] = None


def _limbs16_int(v: int) -> List[int]:
    return [(v >> (16 * i)) & 0xFFFF for i in range(4)]


# ---------------------------------------------------------------------------
# Layout backend
# ---------------------------------------------------------------------------

class _Layout:
    def __init__(self):
        self.r = 0                          # advice row cursor
        self.nidx = 0                       # witness stream cursor
        self.place: List[Tuple[str, int, int]] = []       # (col, row, idx)
        self.copies: List[Tuple[Tuple[str, int], Tuple[str, int]]] = []
        self.consts: List[Tuple[str, int, int]] = []      # (col, row, value)
        self.sel: Dict[str, List[int]] = defaultdict(list)
        self.kcoeff: List[Tuple[int, Tuple[int, ...]]] = []
        self.cst_values: List[int] = []
        self._cst_index: Dict[int, int] = {}
        self.n_outputs = 0

    # -- plumbing ----------------------------------------------------------
    def _push(self, col: str, row: int) -> CellH:
        idx = self.nidx
        self.nidx += 1
        self.place.append((col, row, idx))
        return CellH(col, row, idx)

    def _operand(self, col: str, row: int, cell: CellH) -> None:
        """Place a copy of `cell`'s value at (col, row) + copy constraint."""
        if cell.idx is not None:
            self.place.append((col, row, cell.idx))
        else:
            self.consts.append((col, row, cell.value))
        self.copies.append(((col, row), (cell.col, cell.row)))

    def _cst(self, value: int) -> CellH:
        row = self._cst_index.get(value)
        if row is None:
            row = len(self.cst_values)
            self.cst_values.append(value)
            self._cst_index[value] = row
        return CellH("cst", row, None, value)

    def _pub(self, row: int) -> CellH:
        # instance cell: canonical position is the instance column; a stream
        # slot is still allocated so operand copies can be materialized.
        idx = self.nidx
        self.nidx += 1
        return CellH("pub", row, idx)

    # -- inputs (stream order: t0, t1, f, h0..7, m0..15) --------------------
    def input_t(self, j):
        return WordH(word=self._pub(ROW_T + j))

    def input_f(self):
        return self._pub(ROW_F)

    def input_h(self, i):
        return WordH(word=self._pub(ROW_H + i))

    def input_m(self, j):
        return WordH(word=self._pub(ROW_M + j))

    # -- ops (stream push order documented per op; _Numeric must match) ----
    def dec(self, wh: WordH) -> WordH:
        """stream: l0, s(l0), l1, s(l1), l2, s(l2), l3, s(l3)."""
        r = self.r
        self.r += 2
        self.sel["q_dec"].append(r)
        dense, spread = [], []
        for i in range(4):
            rr = r + i // 2
            dense.append(self._push("d0" if i % 2 == 0 else "d1", rr))
            spread.append(self._push("s0" if i % 2 == 0 else "s1", rr))
        self._operand("w", r, wh.word)
        return WordH(word=wh.word, dense=dense, spread=spread)

    def add(self, u: WordH, v: WordH, x: Optional[WordH]) -> WordH:
        """stream: carry, l0, s0, l1, s1, l2, s2, l3, s3, word."""
        r = self.r
        self.r += 2
        self.sel["q_add"].append(r)
        self._operand("ca", r, u.word)
        self._operand("cb", r, v.word)
        self._operand("cc", r, x.word if x is not None else self._cst(0))
        self._push("ce", r)                       # carry
        dense, spread = [], []
        for i in range(4):
            rr = r + i // 2
            dense.append(self._push("d0" if i % 2 == 0 else "d1", rr))
            spread.append(self._push("s0" if i % 2 == 0 else "s1", rr))
        wcell = self._push("w", r + 1)
        return WordH(word=wcell, dense=dense, spread=spread)

    def xor(self, u: WordH, v: WordH) -> WordH:
        """stream per limb i: odd_i, s(odd_i), even_i, s(even_i)."""
        dense, spread = [], []
        for i in range(4):
            r = self.r
            self.r += 1
            self.sel["q_xor"].append(r)
            self._operand("ca", r, u.spread[i])
            self._operand("cb", r, v.spread[i])
            self._push("d0", r)
            self._push("s0", r)
            dense.append(self._push("d1", r))
            spread.append(self._push("s1", r))
        return WordH(word=None, dense=dense, spread=spread)

    def rcp(self, pieces: Sequence, coeffs: Sequence[int]) -> WordH:
        """stream: word."""
        r = self.r
        self.r += 1
        self.sel["q_rcp"].append(r)
        ks = [0] * 5
        for j, (pc, k) in enumerate(zip(pieces, coeffs)):
            self._operand(RCP_CELLS[j], r, pc)
            ks[j] = k
        self.kcoeff.append((r, tuple(ks)))
        return WordH(word=self._push("w", r))

    def s88(self, wh: WordH, i: int):
        """stream: lo8, s(lo8), hi8, s(hi8)."""
        r = self.r
        self.r += 2
        self.sel["q_s88"].append(r)
        self._operand("ca", r, wh.spread[i])
        lo = self._push("d8", r)
        self._push("s8", r)
        hi = self._push("d8", r + 1)
        self._push("s8", r + 1)
        return lo, hi

    def s115(self, wh: WordH, i: int):
        """stream: lo15, s(lo15), bit."""
        r = self.r
        self.r += 1
        self.sel["q_s115"].append(r)
        self._operand("ca", r, wh.spread[i])
        lo = self._push("d15", r)
        self._push("s15", r)
        bit = self._push("cb", r)
        return lo, bit

    def v14(self, f_cell) -> WordH:
        """stream: 4 spread limbs of IV6 ^ (f * 2^64-1)."""
        r = self.r
        self.r += 1
        self.sel["q_v14"].append(r)
        self._operand("ca", r, f_cell)
        spread = [self._push(c, r) for c in ("cb", "cc", "ce", "cf")]
        return WordH(word=None, dense=None, spread=spread)

    # -- pure (row-free) helpers -------------------------------------------
    def relabel(self, e: WordH, o: int) -> WordH:
        return WordH(word=None,
                     dense=[e.dense[(i + o) % 4] for i in range(4)],
                     spread=[e.spread[(i + o) % 4] for i in range(4)])

    def const_word(self, value: int) -> WordH:
        # spreads included: at rounds=0 the c-lane IV constants flow
        # straight into the finalize XORs (EIP-152 allows rounds=0)
        return WordH(word=self._cst(value),
                     spread=[self._cst(spread_int(l))
                             for l in _limbs16_int(value)])

    def const_spread_word(self, value: int) -> WordH:
        return WordH(spread=[self._cst(spread_int(l))
                             for l in _limbs16_int(value)])

    def expose(self, wh: WordH, i: int) -> None:
        self.copies.append(
            (("pub", ROW_OUT + i), (wh.word.col, wh.word.row)))
        self.n_outputs += 1


# ---------------------------------------------------------------------------
# Numeric backend (pure JAX, batched over the leading axis)
# ---------------------------------------------------------------------------

def _full(word):
    """(..., 2) u64 pair -> WordH with dense/spread as 4-limb LISTS of (...)
    arrays — matching the layout backend's list-of-cells shape so the
    schedule can index limbs identically on both backends."""
    l4 = u64.to_limbs16(word)
    dense = [l4[..., i] for i in range(4)]
    return WordH(word=word, dense=dense, spread=[spread16(d) for d in dense])


class _Numeric:
    def __init__(self, h, m, t, f):
        self.h = jnp.asarray(h, jnp.uint32)     # (..., 8, 2)
        self.m = jnp.asarray(m, jnp.uint32)     # (..., 16, 2)
        self.t = jnp.asarray(t, jnp.uint32)     # (..., 2, 2)
        self.f = jnp.asarray(f).astype(jnp.uint32)   # (...,)
        self.stream: List = []                  # (..., 2) entries
        self.outputs: List = []

    def _push32(self, v):
        self.stream.append(jnp.stack([v, jnp.zeros_like(v)], axis=-1))

    def _push64(self, w):
        self.stream.append(w)

    # -- inputs --
    def input_t(self, j):
        w = self.t[..., j, :]
        self._push64(w)
        return _full(w)

    def input_f(self):
        self._push32(self.f)
        return self.f

    def input_h(self, i):
        w = self.h[..., i, :]
        self._push64(w)
        return _full(w)

    def input_m(self, j):
        w = self.m[..., j, :]
        self._push64(w)
        return _full(w)

    # -- ops --
    def dec(self, wh: WordH) -> WordH:
        full = _full(wh.word)
        for i in range(4):
            self._push32(full.dense[i])
            self._push32(full.spread[i])
        return full

    def add(self, u: WordH, v: WordH, x: Optional[WordH]) -> WordH:
        dense, carry = [], None
        for i in range(4):
            ti = u.dense[i] + v.dense[i]              # < 3·2^16: exact u32
            if x is not None:
                ti = ti + x.dense[i]
            if carry is not None:
                ti = ti + carry
            dense.append(ti & _M16)
            carry = ti >> np.uint32(16)
        self._push32(carry)
        spread = [spread16(d) for d in dense]
        for i in range(4):
            self._push32(dense[i])
            self._push32(spread[i])
        word = u64.from_limbs16(jnp.stack(dense, axis=-1))
        self._push64(word)
        return WordH(word=word, dense=dense, spread=spread)

    def xor(self, u: WordH, v: WordH) -> WordH:
        dense, spread = [], []
        for i in range(4):
            odd = u.dense[i] & v.dense[i]
            even = u.dense[i] ^ v.dense[i]
            se = spread16(even)
            self._push32(odd)
            self._push32(spread16(odd))
            self._push32(even)
            self._push32(se)
            dense.append(even)
            spread.append(se)
        return WordH(word=None, dense=dense, spread=spread)

    def rcp(self, pieces: Sequence, coeffs: Sequence[int]) -> WordH:
        acc = None
        for p, k in zip(pieces, coeffs):
            assert k & (k - 1) == 0, "rcp coefficients must be powers of 2"
            pw = jnp.stack([p, jnp.zeros_like(p)], axis=-1)
            pw = u64.shl(pw, k.bit_length() - 1)
            acc = pw if acc is None else u64.add(acc, pw)
        self._push64(acc)
        return _full(acc)

    def s88(self, wh: WordH, i: int):
        vv = wh.dense[i]
        lo, hi = vv & np.uint32(0xFF), vv >> np.uint32(8)
        self._push32(lo)
        self._push32(spread16(lo))
        self._push32(hi)
        self._push32(spread16(hi))
        return lo, hi

    def s115(self, wh: WordH, i: int):
        vv = wh.dense[i]
        lo, bit = vv & np.uint32(0x7FFF), vv >> np.uint32(15)
        self._push32(lo)
        self._push32(spread16(lo))
        self._push32(bit)
        return lo, bit

    def v14(self, f) -> WordH:
        iv6 = _limbs16_int(IV[6])
        dense = [np.uint32(iv6[i]) ^ (f * _M16) for i in range(4)]
        spread = [spread16(d) for d in dense]
        for i in range(4):
            self._push32(spread[i])
        return WordH(word=None, dense=dense, spread=spread)

    # -- pure helpers --
    def relabel(self, e: WordH, o: int) -> WordH:
        return WordH(word=None,
                     dense=[e.dense[(i + o) % 4] for i in range(4)],
                     spread=[e.spread[(i + o) % 4] for i in range(4)])

    def const_word(self, value: int) -> WordH:
        w = jnp.asarray(u64.from_int(value))
        return _full(jnp.broadcast_to(w, self.f.shape + (2,)))

    def const_spread_word(self, value: int) -> WordH:
        return self.const_word(value)

    def expose(self, wh: WordH, i: int) -> None:
        self.outputs.append(wh.word)


# ---------------------------------------------------------------------------
# The schedule — single source of truth for both backends
# ---------------------------------------------------------------------------

_LIN = (1, 1 << 16, 1 << 32, 1 << 48)


def _init_phase(b):
    """Inputs + initial work vector. Returns (v, hd, m)."""
    t0 = b.input_t(0)
    t1 = b.input_t(1)
    f = b.input_f()
    h = [b.input_h(i) for i in range(8)]
    m = [b.input_m(j) for j in range(16)]

    hd = [b.dec(h[i]) for i in range(8)]       # limbs+spreads of h (finalize)
    td = [b.dec(t0), b.dec(t1)]

    v: List[WordH] = [None] * 16
    for i in range(8):
        v[i] = hd[i]
    for i in range(4):
        v[8 + i] = b.const_word(IV[i])
    v[12] = b.xor(td[0], b.const_spread_word(IV[4]))
    v[13] = b.xor(td[1], b.const_spread_word(IV[5]))
    v[14] = b.v14(f)
    v[15] = b.const_spread_word(IV[7])
    return v, hd, m


def _g_sequence(b, a, bw, c, d, x, y):
    """One G call: 35 rows / 131 stream cells. Shared by both backends AND
    both numeric paths (straight-line layout walk, lax.scan round body)."""
    a1 = b.add(a, bw, x)                        # a1 = a + b + x
    e1 = b.xor(d, a1)
    d1 = b.relabel(e1, 2)                       # >>> 32
    d1.word = b.rcp(d1.dense, _LIN).word

    c1 = b.add(c, d1, None)                     # c1 = c + d1
    e2 = b.xor(bw, c1)
    lo8, hi8 = b.s88(e2, 1)                     # >>> 24: split limb 1
    b1w = b.rcp([e2.dense[0], lo8, hi8, e2.dense[2], e2.dense[3]],
                (1 << 40, 1 << 56, 1, 1 << 8, 1 << 24))
    b1 = b.dec(b1w)

    a2 = b.add(a1, b1, y)                       # a2 = a1 + b1 + y
    e3 = b.xor(d1, a2)
    d2 = b.relabel(e3, 1)                       # >>> 16
    d2.word = b.rcp(d2.dense, _LIN).word

    c2 = b.add(c1, d2, None)                    # c2 = c1 + d2
    e4 = b.xor(b1, c2)
    lo15, bit = b.s115(e4, 3)                   # >>> 63: split top limb
    b2w = b.rcp([e4.dense[0], e4.dense[1], e4.dense[2], lo15, bit],
                (2, 1 << 17, 1 << 33, 1 << 49, 1))
    b2 = b.dec(b2w)
    return a2, b2, c2, d2


def _round(b, v, xys):
    """One round: 8 G calls with pre-selected (x, y) message operands."""
    for gi, (ia, ib, ic, idd) in enumerate(G_INDICES):
        x, y = xys[gi]
        v[ia], v[ib], v[ic], v[idd] = _g_sequence(
            b, v[ia], v[ib], v[ic], v[idd], x, y)


def _final_phase(b, v, hd):
    for i in range(8):
        tmp = b.xor(v[i], v[i + 8])
        out = b.xor(tmp, hd[i])
        hw = b.rcp(out.dense, _LIN)
        b.expose(hw, i)


def _schedule(b, rounds: int = 12) -> None:
    v, hd, m = _init_phase(b)
    for rd in range(rounds):
        s = SIGMA[rd % 10]
        xys = [(m[s[2 * gi]], m[s[2 * gi + 1]]) for gi in range(8)]
        _round(b, v, xys)
    _final_phase(b, v, hd)


def _numeric_stream(h, m, t, f, rounds: int):
    """Witness value stream, rounds under `lax.scan` (the straight-line walk
    is ~15k primitives and takes minutes to compile; the scan body is one
    round = ~1.3k). Push order matches `_schedule` exactly: init cells, then
    rounds (each via the shared `_round`), then the finalize cells.

    Returns (stream (B, ncells, 2), outputs (B, 8, 2))."""
    nb = _Numeric(h, m, t, f)
    v, hd, mh = _init_phase(nb)
    init_stream = jnp.stack(nb.stream, axis=-2)           # (B, ci, 2)

    def pack(ws):
        d = jnp.stack([jnp.stack(w.dense, axis=-1) for w in ws], axis=-2)
        s = jnp.stack([jnp.stack(w.spread, axis=-1) for w in ws], axis=-2)
        return d, s                                        # (B, L, 4) each

    def unpack(d, s, L):
        return [WordH(word=None,
                      dense=[d[..., i, j] for j in range(4)],
                      spread=[s[..., i, j] for j in range(4)])
                for i in range(L)]

    if rounds:
        vd0, vs0 = pack(v)
        md, _ = pack(mh)                                   # (B, 16, 4)
        sig = np.asarray(SIGMA, np.int32)
        msel = np.stack([sig[np.arange(rounds) % 10, 2 * gi:2 * gi + 2]
                         for gi in range(8)], axis=1)      # (rounds, 8, 2)

        def body(carry, msel_r):
            vd, vs = carry
            nbr = _Numeric(h, m, t, f)
            vv = unpack(vd, vs, 16)
            xys = []
            for gi in range(8):
                xd = jnp.take(md, msel_r[gi, 0], axis=-2)  # (B, 4)
                yd = jnp.take(md, msel_r[gi, 1], axis=-2)
                xys.append((
                    WordH(dense=[xd[..., j] for j in range(4)]),
                    WordH(dense=[yd[..., j] for j in range(4)])))
            _round(nbr, vv, xys)
            ys = jnp.stack(nbr.stream, axis=-2)            # (B, cr, 2)
            vd2, vs2 = pack(vv)
            return (vd2, vs2), ys

        (vdf, vsf), round_ys = jax.lax.scan(
            body, (vd0, vs0), jnp.asarray(msel))
        # (rounds, B, cr, 2) -> (B, rounds·cr, 2)
        round_stream = jnp.moveaxis(round_ys, 0, 1)
        round_stream = round_stream.reshape(
            round_stream.shape[0], -1, 2)
        v = unpack(vdf, vsf, 16)
    else:
        round_stream = jnp.zeros(init_stream.shape[:-2] + (0, 2), jnp.uint32)

    nbf = _Numeric(h, m, t, f)
    _final_phase(nbf, v, hd)
    final_stream = jnp.stack(nbf.stream, axis=-2)
    stream = jnp.concatenate([init_stream, round_stream, final_stream],
                             axis=-2)
    return stream, jnp.stack(nbf.outputs, axis=-2)


# ---------------------------------------------------------------------------
# Circuit assembly + witness generation
# ---------------------------------------------------------------------------

def _gates() -> List[Gate]:
    P16, P32, P48, P64 = 1 << 16, 1 << 32, 1 << 48, 1 << 64

    def word_expr(off=0):
        return (V("d0", off) + V("d1", off) * P16
                + V("d0", off + 1) * P32 + V("d1", off + 1) * P48)

    gates = [
        Gate("dec", V("q_dec") * (V("w") - word_expr())),
        Gate("add.sum", V("q_add") * (V("ca") + V("cb") + V("cc")
                                      - V("w", 1) - V("ce") * P64)),
        Gate("add.limbs", V("q_add") * (V("w", 1) - word_expr())),
        Gate("add.carry",
             V("q_add") * V("ce") * (V("ce") - 1) * (V("ce") - 2)),
        Gate("xor", V("q_xor") * (V("ca") + V("cb") - V("s1") - 2 * V("s0"))),
        Gate("rcp", V("q_rcp") * (
            V("w") - (V("k1") * V("ca") + V("k2") * V("cb")
                      + V("k3") * V("cc") + V("k4") * V("ce")
                      + V("k5") * V("cf")))),
        Gate("s88", V("q_s88") * (V("ca") - V("s8") - V("s8", 1) * (4 ** 8))),
        Gate("s115", V("q_s115") * (V("ca") - V("s15") - V("cb") * (4 ** 15))),
        Gate("s115.bit", V("q_s115") * V("cb") * (V("cb") - 1)),
        Gate("v14.bit", V("q_v14") * V("ca") * (V("ca") - 1)),
    ]
    # v14 spread selects: spr_i = S(IV6_i) + f·(S(IV6_i ^ 0xFFFF) − S(IV6_i))
    for i, col in enumerate(("cb", "cc", "ce", "cf")):
        c0 = spread_int(_limbs16_int(IV[6])[i])
        c1 = spread_int(_limbs16_int(IV[6])[i] ^ 0xFFFF)
        gates.append(Gate(
            f"v14.s{i}",
            V("q_v14") * (V(col) - Const(c0) - V("ca") * Const(c1 - c0))))
    return gates


class Blake2fCircuit:
    """A built circuit (fixed shape: k, instances, rounds) + witness gen."""

    def __init__(self, k: int = 17, n_inst: int = 1, rounds: int = 12):
        self.k, self.n_inst, self.rounds = k, n_inst, rounds
        n = 1 << k
        lay = _Layout()
        _schedule(lay, rounds)
        self.rows_per_inst = lay.r
        self.ncells = lay.nidx
        usable = n - BLINDING_ROWS - 1
        assert lay.r * n_inst <= usable, \
            f"{n_inst} instances × {lay.r} rows > usable {usable}"
        assert (1 << 16) <= n, "spread table needs k >= 17"
        self._lay = lay

        # --- fixed columns -------------------------------------------------
        fixed: Dict[str, np.ndarray] = {}
        inst_off = lay.r * np.arange(n_inst)
        for q in SELECTORS:
            col = np.zeros((n, 2), np.uint32)
            rows = (np.asarray(lay.sel[q], np.int64)[None, :]
                    + inst_off[:, None]).ravel()
            col[rows, 0] = 1
            fixed[q] = col
        kvals = {r: ks for r, ks in lay.kcoeff}
        for j, kc in enumerate(KCOLS):
            col = np.zeros((n, 2), np.uint32)
            base_rows = np.asarray(sorted(kvals), np.int64)
            vals = u64.from_ints([kvals[r][j] for r in sorted(kvals)])
            rows = (base_rows[None, :] + inst_off[:, None]).ravel()
            col[rows] = np.tile(vals, (n_inst, 1))
            fixed[kc] = col
        cst = np.zeros((n, 2), np.uint32)
        if lay.cst_values:
            cst[: len(lay.cst_values)] = u64.from_ints(lay.cst_values)
        fixed["cst"] = cst
        fixed["t16d"], fixed["t16s"] = table_u64(16, n)
        fixed["t8d"], fixed["t8s"] = table_u64(8, n)
        fixed["t15d"], fixed["t15s"] = table_u64(15, n)

        # --- copies, tiled over instances -----------------------------------
        def _off(col: str) -> Tuple[int, np.ndarray]:
            if col == "pub":
                return R_PUB, inst_off * 0 + R_PUB * np.arange(n_inst)
            if col == "cst":
                return 0, np.zeros(n_inst, np.int64)
            return lay.r, inst_off

        groups: Dict[Tuple[str, str], List[Tuple[int, int]]] = defaultdict(list)
        for (ca_, ra), (cb_, rb) in lay.copies:
            groups[(ca_, cb_)].append((ra, rb))
        copies = []
        for (ca_, cb_), prs in groups.items():
            ra = np.asarray([p[0] for p in prs], np.int64)
            rb = np.asarray([p[1] for p in prs], np.int64)
            _, offa = _off(ca_)
            _, offb = _off(cb_)
            copies.append(CopyGroup(
                ca_, (ra[None, :] + offa[:, None]).ravel(),
                cb_, (rb[None, :] + offb[:, None]).ravel()))

        self.circ = CircuitDef(
            k=k, advice_names=list(ADVICE), instance_names=["pub"],
            fixed=fixed, gates=_gates(),
            lookups=[
                Lookup("l16a", ["d0", "s0"], ["t16d", "t16s"]),
                Lookup("l16b", ["d1", "s1"], ["t16d", "t16s"]),
                Lookup("l8", ["d8", "s8"], ["t8d", "t8s"]),
                Lookup("l15", ["d15", "s15"], ["t15d", "t15s"]),
            ],
            copies=copies,
            instance_len={"pub": R_PUB * n_inst})
        self.circ.validate()

        # --- witness scatter plan -------------------------------------------
        by_col: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
        for col, row, idx in lay.place:
            by_col[col].append((row, idx))
        self._scatter = {
            col: (np.asarray([p[0] for p in ps], np.int32),
                  np.asarray([p[1] for p in ps], np.int32))
            for col, ps in by_col.items()}
        cby: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
        for col, row, val in lay.consts:
            cby[col].append((row, val))
        self._const_scatter = {
            col: (np.asarray([p[0] for p in ps], np.int32),
                  u64.from_ints([p[1] for p in ps]))
            for col, ps in cby.items()}

    # ------------------------------------------------------------------
    def witness(self, h, m, t, f):
        """Batched witness: h (B,8,2), m (B,16,2), t (B,2,2), f (B,).

        B must equal n_inst. Returns (advice dict, instance dict), each
        column an (n, 2) uint32 tensor. The whole computation (schedule +
        scatter) runs as ONE jitted program — the schedule alone is ~13k
        small ops and would take minutes in eager dispatch."""
        if not hasattr(self, "_jit_witness"):
            self._jit_witness = jax.jit(self._witness_impl)
        h, m, t = (jnp.asarray(x, jnp.uint32) for x in (h, m, t))
        from ..utils import aot

        key = (f"witness_k{self.k}_i{self.n_inst}_r{self.rounds}"
               f"_c{self.ncells}")
        return aot.call(key, self._jit_witness, h, m, t, jnp.asarray(f))

    def _witness_impl(self, h, m, t, f):
        B, n, R = self.n_inst, 1 << self.k, self.rows_per_inst
        assert h.shape == (B, 8, 2), h.shape
        stream, outputs = _numeric_stream(h, m, t, f, self.rounds)
        assert stream.shape[-2] == self.ncells, \
            (stream.shape, self.ncells)

        adv = {}
        boff = (R * np.arange(B, dtype=np.int64))[:, None]
        for col in ADVICE:
            arr = jnp.zeros((n, 2), jnp.uint32)
            if col in self._scatter:
                rows, idxs = self._scatter[col]
                trows = (rows[None, :] + boff).ravel()
                vals = stream[:, idxs, :].reshape(-1, 2)
                arr = arr.at[trows].set(vals)
            if col in self._const_scatter:
                rows, vals = self._const_scatter[col]
                trows = (rows[None, :] + boff).ravel()
                tvals = jnp.tile(jnp.asarray(vals), (B, 1))
                arr = arr.at[trows].set(tvals)
            adv[col] = arr

        # instance column: t0,t1,f,h,m,h'
        outs = outputs                                 # (B, 8, 2)
        fcol = jnp.stack([f.astype(jnp.uint32),
                          jnp.zeros_like(f, jnp.uint32)], axis=-1)
        block = jnp.concatenate(
            [t, fcol[:, None, :], h, m, outs], axis=-2)   # (B, 35, 2)
        pub = jnp.zeros((n, 2), jnp.uint32)
        prow = (R_PUB * np.arange(B, dtype=np.int64)[:, None]
                + np.arange(R_PUB)[None, :]).ravel()
        pub = pub.at[prow].set(block.reshape(-1, 2))
        return adv, {"pub": pub}
