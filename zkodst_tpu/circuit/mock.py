"""Vectorized constraint checker — the MockProver equivalent.

Plays the role of `halo2_proofs::dev::MockProver` (used by the reference's
only live test, /root/reference/blake2f-circuit/src/blake2f/table16/
spread_table.rs:622-764; SURVEY.md §2.3 N5): evaluates every gate, lookup and
copy constraint directly on the witness with no cryptography. Unlike
MockProver's cell-at-a-time walk, gates here are evaluated as whole-column
tensor expressions in one jitted pass; lookups and copies are host-side set /
index checks on the raw u64 cell values.

This is the TDD backbone: every circuit feature lands with a mock check (and
a negative test) before the real prover exists.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from .expr import eval_expr
from .ir import CircuitDef, u64_cols_to_field


@dataclass
class Failure:
    kind: str       # "gate" | "lookup" | "copy" | "shape"
    name: str
    rows: np.ndarray

    def __str__(self):
        head = ", ".join(str(r) for r in self.rows[:8])
        more = "…" if len(self.rows) > 8 else ""
        return f"{self.kind} '{self.name}' violated at rows [{head}{more}]" \
               f" ({len(self.rows)} rows)"


def _gate_checker(circ: CircuitDef):
    """Build (once) the jitted all-gates evaluator for this circuit."""
    F = circ.field

    def run(cols_u64: Dict[str, jnp.ndarray]):
        fcols = {name: u64_cols_to_field(F, c) for name, c in cols_u64.items()}
        cache: dict = {}

        def getcol(name, rot):
            c = fcols[name]
            return jnp.roll(c, -rot, axis=0) if rot else c

        outs = []
        for g in circ.gates:
            r = eval_expr(g.poly, F, getcol, cache)
            outs.append(jnp.any(r != 0, axis=-1))   # (n,) nonzero mask
        return jnp.stack(outs) if outs else jnp.zeros((0, circ.n), bool)

    return jax.jit(run)


def check(circ: CircuitDef,
          advice: Dict[str, np.ndarray],
          instance: Dict[str, np.ndarray]) -> List[Failure]:
    """Returns a list of constraint failures (empty == circuit satisfied)."""
    n = circ.n
    failures: List[Failure] = []

    cols_u64: Dict[str, np.ndarray] = {}
    for name, arr in {**circ.fixed, **advice, **instance}.items():
        arr = np.asarray(arr, np.uint32)
        if arr.shape != (n, 2):
            failures.append(Failure("shape", name, np.array([])))
            continue
        cols_u64[name] = arr
    missing = (set(circ.advice_names) | set(circ.instance_names)) - set(cols_u64)
    for name in sorted(missing):
        failures.append(Failure("shape", name, np.array([])))
    if failures:
        return failures

    # --- gates (jitted, all rows; selectors vanish on unused rows) --------
    checker = getattr(circ, "_mock_gate_checker", None)
    if checker is None:
        checker = _gate_checker(circ)
        circ._mock_gate_checker = checker
    bad = np.asarray(checker(cols_u64))
    for g, mask in zip(circ.gates, bad):
        rows = np.nonzero(mask)[0]
        if rows.size:
            failures.append(Failure("gate", g.name, rows))

    # --- lookups (vectorized multiset membership: rows packed to void keys,
    # np.isin — the Python-set version took minutes at 2^17 rows) -----------
    usable = circ.usable_rows

    def _rowkeys(cols):
        packed = np.ascontiguousarray(
            np.stack(cols, axis=1))                 # (rows, c, 2) uint32
        return packed.reshape(packed.shape[0], -1).view(
            [("", np.uint32)] * (2 * len(cols))).ravel()

    for lk in circ.lookups:
        tkeys = _rowkeys([cols_u64[c] for c in lk.table_cols])
        ikeys = _rowkeys([cols_u64[c][:usable] for c in lk.input_cols])
        rows = np.nonzero(~np.isin(ikeys, tkeys))[0]
        if rows.size:
            failures.append(Failure("lookup", lk.name, rows))

    # --- copies (exact u64 equality) ---------------------------------------
    for cp in circ.copies:
        a = cols_u64[cp.col_a][cp.rows_a]
        b = cols_u64[cp.col_b][cp.rows_b]
        neq = np.any(a != b, axis=-1)
        rows = cp.rows_a[np.nonzero(neq)[0]]
        if rows.size:
            failures.append(Failure(
                "copy", f"{cp.col_a}<->{cp.col_b}", rows))

    return failures


def check_or_raise(circ, advice, instance) -> None:
    fails = check(circ, advice, instance)
    if fails:
        raise AssertionError(
            "mock check failed:\n  " + "\n  ".join(str(f) for f in fails))
