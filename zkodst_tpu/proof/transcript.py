"""Fiat–Shamir transcript: Blake2b write/read pair.

Host-side equivalent of halo2's `Blake2bWrite`/`Blake2bRead` +
`Challenge255` (used by the reference's bench harness,
/root/reference/benchmarking/src/blake2f_circuit_bench.rs:12-14,56,85;
SURVEY.md §2.3 N12). Two wire formats behind the `mode` flag
(docs/FORMAT.md §compat):

``mode="v1"`` (default — the pinned native format):
* Blake2b-512 with personalization ``b"Halo2-Transcript"``.
* Domain prefixes: 0 = challenge squeeze, 1 = point, 2 = scalar.
* Points absorbed AND serialized in 32-byte compressed form (LE x,
  y-parity in bit 255; identity = all zeros). Scalars as 32-byte LE.
* ``squeeze_challenge``: absorb prefix 0, clone-finalize to 64 bytes,
  reduce the 512-bit LE integer mod r (Challenge255 semantics).

``mode="halo2ce"`` (compatibility flavor, VERDICT r2 #4): implements the
divergences docs/FORMAT.md enumerates as halo2-ce behaviors —
* points are ABSORBED as full affine coordinates (x ∥ y, 32-byte LE
  each; halo2's `common_point` absorbs `coordinates()`, not the
  compressed encoding) while the PROOF carries the halo2curves bn256
  compressed layout: LE x with the y-sign in byte 31 **bit 6** (Fq is
  254 bits; halo2curves keeps bit 7 clear), identity = all zeros;
* the verifying key binds as ONE `transcript_repr` scalar (blake2b-512
  over a canonical vk serialization, reduced mod r) — halo2's
  `VerifyingKey::hash_into` mechanism — instead of v1's per-commitment
  absorbs (keygen.VerifyingKey.hash_into dispatches on the mode).
Byte parity against a live halo2-ce binary cannot be tested in this
environment (no Rust toolchain); the mode pins the documented encoding
rules and is itself fixture-tested (tests/test_transcript_compat.py).

The transcript runs between device compute phases; all values crossing it
are tiny (64-byte absorbs / 32-byte proof elements).
"""

from __future__ import annotations

import hashlib

from ..ops import pycurve
from ..ops.pyfield import FQ, FR

PERSON = b"Halo2-Transcript"
PREFIX_CHALLENGE = b"\x00"
PREFIX_POINT = b"\x01"
PREFIX_SCALAR = b"\x02"

MODES = ("v1", "halo2ce", "pasta")


def compress_g1(pt) -> bytes:
    """Affine (x, y) int tuple or None -> 32 bytes (LE x, y-parity bit 255)."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(int(x).to_bytes(32, "little"))
    assert b[31] & 0xC0 == 0, "x exceeds 254 bits"
    if y & 1:
        b[31] |= 0x80
    return bytes(b)


def decompress_g1(data: bytes):
    """Inverse of compress_g1; validates the point is on the curve."""
    assert len(data) == 32
    if data == bytes(32):
        return None
    b = bytearray(data)
    ysign = (b[31] >> 7) & 1
    b[31] &= 0x3F
    x = int.from_bytes(bytes(b), "little")
    assert x < FQ.p, "x out of range"
    y = FQ.sqrt((x * x % FQ.p) * x % FQ.p + pycurve.B1)
    assert y is not None, "not on curve"
    if (y & 1) != ysign:
        y = FQ.p - y
    assert pycurve.G1.is_on_curve((x, y))
    return (x, y)


def compress_g1_halo2ce(pt) -> bytes:
    """halo2curves bn256 layout: 32-byte LE x, y-sign in byte 31 bit 6."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(int(x).to_bytes(32, "little"))
    assert b[31] & 0xC0 == 0, "x exceeds 254 bits"
    if y & 1:
        b[31] |= 0x40
    return bytes(b)


def decompress_g1_halo2ce(data: bytes):
    """Inverse of compress_g1_halo2ce; validates curve membership."""
    assert len(data) == 32
    if data == bytes(32):
        return None
    b = bytearray(data)
    assert (b[31] >> 7) & 1 == 0, "bit 255 must be clear (halo2curves)"
    ysign = (b[31] >> 6) & 1
    b[31] &= 0x3F
    x = int.from_bytes(bytes(b), "little")
    assert x < FQ.p, "x out of range"
    y = FQ.sqrt((x * x % FQ.p) * x % FQ.p + pycurve.B1)
    assert y is not None, "not on curve"
    if (y & 1) != ysign:
        y = FQ.p - y
    assert pycurve.G1.is_on_curve((x, y))
    return (x, y)


def _coords_bytes(pt) -> bytes:
    """Full affine coordinates x ∥ y (32-byte LE each); identity = zeros."""
    if pt is None:
        return bytes(64)
    return (int(pt[0]).to_bytes(32, "little")
            + int(pt[1]).to_bytes(32, "little"))


def compress_pasta(pt) -> bytes:
    """Pasta pallas-curve point codec: LE x (255 bits), y-parity bit 255.

    PALLAS_BASE is slightly above 2^254, so bit 254 belongs to x and only
    bit 255 is free for the sign; identity = 32 zero bytes."""
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(int(x).to_bytes(32, "little"))
    assert b[31] & 0x80 == 0, "x exceeds 255 bits"
    if y & 1:
        b[31] |= 0x80
    return bytes(b)


def decompress_pasta(data: bytes):
    """Inverse of compress_pasta (y² = x³ + 5 over PALLAS_BASE)."""
    from ..ops.pyfield import PALLAS_BASE, PF

    assert len(data) == 32
    if data == bytes(32):
        return None
    pf = PF(PALLAS_BASE, "pallas_base")
    b = bytearray(data)
    ysign = (b[31] >> 7) & 1
    b[31] &= 0x7F
    x = int.from_bytes(bytes(b), "little")
    assert x < pf.p, "x out of range"
    y = pf.sqrt(((x * x % pf.p) * x + 5) % pf.p)
    assert y is not None, "not on curve"
    if (y & 1) != ysign:
        y = pf.p - y
    return (x, y)


def _scalar_mod(mode: str) -> int:
    if mode == "pasta":
        from ..ops.pyfield import VESTA_BASE

        return VESTA_BASE
    return FR.p


class Blake2bWrite:
    """Prover-side transcript: absorbs proof elements, emits proof bytes."""

    def __init__(self, mode: str = "v1"):
        assert mode in MODES, mode
        self.mode = mode
        self._r = _scalar_mod(mode)
        self._h = hashlib.blake2b(digest_size=64, person=PERSON)
        self._proof = bytearray()

    def _point_absorb(self, pt) -> None:
        self._h.update(PREFIX_POINT)
        if self.mode == "halo2ce":
            self._h.update(_coords_bytes(pt))
        else:
            self._h.update(self._point_wire(pt))

    def _point_wire(self, pt) -> bytes:
        if self.mode == "halo2ce":
            return compress_g1_halo2ce(pt)
        if self.mode == "pasta":
            return compress_pasta(pt)
        return compress_g1(pt)

    # -- absorb without writing to the proof (public inputs / vk hash) -----
    def common_point(self, pt) -> None:
        self._point_absorb(pt)

    def common_scalar(self, v: int) -> None:
        self._h.update(PREFIX_SCALAR)
        self._h.update((int(v) % self._r).to_bytes(32, "little"))

    # -- absorb and append to the proof -------------------------------------
    def write_point(self, pt) -> None:
        self.common_point(pt)
        self._proof += self._point_wire(pt)

    def write_scalar(self, v: int) -> None:
        self.common_scalar(v)
        self._proof += (int(v) % self._r).to_bytes(32, "little")

    def squeeze_challenge(self) -> int:
        self._h.update(PREFIX_CHALLENGE)
        wide = self._h.copy().digest()
        return int.from_bytes(wide, "little") % self._r

    def finalize(self) -> bytes:
        return bytes(self._proof)


class Blake2bRead:
    """Verifier-side transcript: replays a proof byte stream."""

    def __init__(self, proof: bytes, mode: str = "v1"):
        assert mode in MODES, mode
        self.mode = mode
        self._r = _scalar_mod(mode)
        self._h = hashlib.blake2b(digest_size=64, person=PERSON)
        self._proof = proof
        self._pos = 0

    def common_point(self, pt) -> None:
        self._h.update(PREFIX_POINT)
        if self.mode == "halo2ce":
            self._h.update(_coords_bytes(pt))
        elif self.mode == "pasta":
            self._h.update(compress_pasta(pt))
        else:
            self._h.update(compress_g1(pt))

    def common_scalar(self, v: int) -> None:
        self._h.update(PREFIX_SCALAR)
        self._h.update((int(v) % self._r).to_bytes(32, "little"))

    def _take(self, nbytes: int) -> bytes:
        assert self._pos + nbytes <= len(self._proof), "proof too short"
        out = self._proof[self._pos: self._pos + nbytes]
        self._pos += nbytes
        return out

    def read_point(self):
        data = self._take(32)
        if self.mode == "halo2ce":
            pt = decompress_g1_halo2ce(data)
        elif self.mode == "pasta":
            pt = decompress_pasta(data)
        else:
            pt = decompress_g1(data)
        self.common_point(pt)
        return pt

    def read_scalar(self) -> int:
        v = int.from_bytes(self._take(32), "little")
        assert v < self._r, "scalar out of range"
        self._h.update(PREFIX_SCALAR)
        self._h.update(v.to_bytes(32, "little"))
        return v

    def squeeze_challenge(self) -> int:
        self._h.update(PREFIX_CHALLENGE)
        wide = self._h.copy().digest()
        return int.from_bytes(wide, "little") % self._r

    def done(self) -> bool:
        return self._pos == len(self._proof)
