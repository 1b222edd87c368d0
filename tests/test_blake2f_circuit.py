"""BLAKE2f circuit: mock-prover tests on the EIP-152 vector.

The TPU equivalent of the reference's (commented-out) circuit test at
/root/reference/blake2f-circuit/src/blake2f.rs:281-304, completed: positive
mock check + negative tests that corrupt one cell per constraint family
(SURVEY.md §4 items 1-2)."""

import numpy as np
import pytest

_SLOW = pytest.mark.slow

from zkodst_tpu.circuit import blake2f as bc
from zkodst_tpu.circuit import mock
from zkodst_tpu.ops import blake2, u64


@pytest.fixture(scope="module")
def built():
    return bc.Blake2fCircuit(k=17, n_inst=1, rounds=12)


# witness generation at k=17 compiles for tens of minutes on the 1-core CPU
# backend; everything touching it is `slow` (TPU-run via scripts/)
@pytest.fixture(scope="module")
def vec_witness(built):
    v = blake2.EIP152_VECTOR
    h = u64.from_ints(v["h"])[None]
    m = u64.from_ints(v["m"])[None]
    t = u64.from_ints(v["t"])[None]
    f = np.array([v["f"]], bool)
    adv, inst = built.witness(h, m, t, f)
    return ({k: np.asarray(a) for k, a in adv.items()},
            {k: np.asarray(a) for k, a in inst.items()})


@_SLOW
def test_witness_outputs_match_oracle(built, vec_witness):
    v = blake2.EIP152_VECTOR
    _, inst = vec_witness
    pub = inst["pub"]
    outs = [int(u64.to_int(pub[bc.ROW_OUT + i])) for i in range(8)]
    expected = blake2.blake2f_py(list(v["h"]), list(v["m"]), v["t"], v["f"])
    assert outs == expected
    digest = b"".join(x.to_bytes(8, "little") for x in outs).hex()
    assert digest == v["expected"]


@_SLOW
def test_mock_check_passes(built, vec_witness):
    adv, inst = vec_witness
    fails = mock.check(built.circ, adv, inst)
    assert fails == [], "\n".join(str(f) for f in fails)


def _corrupt(vec_witness, col, row, delta=1):
    adv, inst = vec_witness
    adv = {k: a.copy() for k, a in adv.items()}
    adv[col][row, 0] ^= delta
    return adv, inst


@_SLOW
@pytest.mark.parametrize("col", ["d1", "s1", "w", "ca", "ce"])
def test_corruption_detected(built, vec_witness, col):
    # find a row where the column is nonzero (so the flip changes semantics)
    adv0, _ = vec_witness
    rows = np.nonzero(adv0[col][:, 0])[0]
    row = int(rows[len(rows) // 2])
    adv, inst = _corrupt(vec_witness, col, row)
    fails = mock.check(built.circ, adv, inst)
    assert fails, f"corrupting {col}[{row}] went undetected"


@_SLOW
def test_wrong_public_output_detected(built, vec_witness):
    adv, inst = vec_witness
    inst = {k: a.copy() for k, a in inst.items()}
    inst["pub"][bc.ROW_OUT, 0] ^= 1
    fails = mock.check(built.circ, adv, inst)
    assert any(f.kind == "copy" for f in fails)


def test_row_budget(built):
    # layout invariants: documented row/cell counts stay in budget
    assert built.rows_per_inst < 3600
    assert built.ncells < 14000
    assert bc.R_PUB == 35
