"""ctypes binding for the native C++ crypto core (native/zkcore.cpp).

Builds `libzkcore.so` on demand with g++ (no pybind11 per the environment;
plain C ABI + ctypes). Accelerates the host-side verifier: the BN254
pairing product check and the verifier's small G1 MSMs — the role Rust
`halo2curves` plays for the reference's `verify_proof` (SURVEY.md §2.3 N4).
Falls back to the pure-Python implementations when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

from .ops.pycurve import R_ORDER
from .ops.pyfield import FQ

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "zkcore.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libzkcore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_FINAL_EXP = (FQ.p ** 12 - 1) // R_ORDER
_EXP_BYTES = _FINAL_EXP.to_bytes((_FINAL_EXP.bit_length() + 7) // 8,
                                 "little")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.zk_selftest.restype = ctypes.c_int
        lib.zk_pairing_check.restype = ctypes.c_int
        if lib.zk_selftest() != 0:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _pt_bytes(pt) -> Tuple[bytes, int]:
    if pt is None:
        return bytes(64), 1
    return (int(pt[0]).to_bytes(32, "little")
            + int(pt[1]).to_bytes(32, "little")), 0


def pairing_check(pairs: Sequence[Tuple[object, object]]) -> bool:
    """∏ e(P_i, Q_i) == 1 — native if possible, else Python fallback."""
    lib = get_lib()
    if lib is None:
        from .proof import pairing as ppy
        return ppy.pairing_check(pairs)
    n = len(pairs)
    g1b, g1i, g2b, g2i = b"", [], b"", []
    for g1, g2 in pairs:
        b, inf = _pt_bytes(g1)
        g1b += b
        g1i.append(inf)
        if g2 is None:
            g2b += bytes(128)
            g2i.append(1)
        else:
            (x0, x1), (y0, y1) = g2
            g2b += (int(x0).to_bytes(32, "little")
                    + int(x1).to_bytes(32, "little")
                    + int(y0).to_bytes(32, "little")
                    + int(y1).to_bytes(32, "little"))
            g2i.append(0)
    res = lib.zk_pairing_check(
        g1b, bytes(g1i), g2b, bytes(g2i), ctypes.c_int(n),
        _EXP_BYTES, ctypes.c_int(len(_EXP_BYTES)))
    return bool(res)


def g1_msm(points: Sequence[object], scalars: Sequence[int]):
    """Σ k_i·P_i on the host (affine int tuples; None = identity)."""
    lib = get_lib()
    if lib is None:
        from .ops import pycurve
        acc = None
        for p, k in zip(points, scalars):
            acc = pycurve.G1.add(acc, pycurve.G1.mul(p, k))
        return acc
    n = len(points)
    pb, infs, sb = b"", [], b""
    for p, k in zip(points, scalars):
        b, inf = _pt_bytes(p)
        pb += b
        infs.append(inf)
        sb += (int(k) % R_ORDER).to_bytes(32, "little")
    out = (ctypes.c_uint8 * 65)()
    lib.zk_g1_msm(pb, bytes(infs), sb, ctypes.c_int(n), out)
    raw = bytes(out)
    if raw[0]:
        return None
    return (int.from_bytes(raw[1:33], "little"),
            int.from_bytes(raw[33:65], "little"))
