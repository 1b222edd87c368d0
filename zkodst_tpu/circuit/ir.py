"""Circuit IR: columns-as-tensors PLONKish circuit description.

The TPU-native replacement for halo2's `ConstraintSystem` + `Layouter`
machinery (reference: /root/reference/blake2f-circuit/src/blake2f/table16.rs
:277-327 `Table16Chip::configure`, SURVEY.md §2.3 N1). Key re-design:

* A circuit is **static data**: fixed column tensors, gate expression trees,
  lookup registrations and a copy-constraint list — no layouter, no regions,
  no per-cell assignment. Row placement is computed once, host-side, by the
  circuit builder (e.g. :mod:`.blake2f`).
* Every cell value is semantically a u64, stored as a uint32 pair
  ``(..., n, 2)`` (see :mod:`..ops.u64`); conversion to BN254 Fr Montgomery
  limb tensors happens in one vectorized pass (:func:`u64_cols_to_field`)
  inside the mock checker / prover.
* Copies (halo2 `copy_advice` / `enable_equality`) are **vectorized groups**:
  (col_a, rows_a, col_b, rows_b) with whole index arrays, since the builder
  emits thousands of structurally identical copies per instance block.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Dict, List, Sequence

import numpy as np

from ..ops import u64
from ..ops.field import FR, Field
from .expr import Expr

# Rows at the tail of the domain reserved for blinding factors (halo2's
# "blinding rows"; usable = n - BLINDING - 1, the -1 being the l_last row).
BLINDING_ROWS = 8


@dataclass(frozen=True)
class Gate:
    """One polynomial identity that must vanish on every row.

    Selector gating is folded into `poly` by the builder (selector columns
    are ordinary fixed columns here)."""

    name: str
    poly: Expr


@dataclass(frozen=True)
class Lookup:
    """(input columns) ⊆ (table columns) on every usable row.

    Inputs are plain advice columns (rotation 0) by design — the BLAKE2f
    layout never needs expression inputs, which keeps the lookup argument's
    degree minimal and the permuted-input build a pure gather."""

    name: str
    input_cols: Sequence[str]
    table_cols: Sequence[str]


@dataclass(frozen=True)
class CopyGroup:
    """columns[col_a][rows_a] must equal columns[col_b][rows_b] (vectorized)."""

    col_a: str
    rows_a: np.ndarray
    col_b: str
    rows_b: np.ndarray


@dataclass
class CircuitDef:
    k: int
    advice_names: List[str]
    instance_names: List[str]
    fixed: Dict[str, np.ndarray]          # name -> (n, 2) uint32 u64 values
    gates: List[Gate] = dfield(default_factory=list)
    lookups: List[Lookup] = dfield(default_factory=list)
    copies: List[CopyGroup] = dfield(default_factory=list)
    field: Field = FR
    # number of meaningful leading rows per instance column — the public-
    # input vector the verifier receives (halo2's `instances: &[&[F]]` has
    # exactly this length; rows past it are zero padding). Used by the
    # halo2ce transcript mode's per-value instance absorption.
    instance_len: Dict[str, int] = dfield(default_factory=dict)

    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def usable_rows(self) -> int:
        return self.n - BLINDING_ROWS - 1

    def column_kind(self, name: str) -> str:
        if name in self.fixed:
            return "fixed"
        if name in self.advice_names:
            return "advice"
        if name in self.instance_names:
            return "instance"
        raise KeyError(name)

    def max_gate_degree(self) -> int:
        return max((g.poly.degree() for g in self.gates), default=0)

    def validate(self) -> None:
        n = self.n
        names = (set(self.fixed) | set(self.advice_names)
                 | set(self.instance_names))
        assert len(names) == (len(self.fixed) + len(self.advice_names)
                              + len(self.instance_names)), "duplicate column"
        for f in self.fixed.values():
            assert f.shape == (n, 2) and f.dtype == np.uint32
        for g in self.gates:
            for col, _ in g.poly.vars():
                assert col in names, f"gate {g.name}: unknown column {col}"
        for lk in self.lookups:
            assert len(lk.input_cols) == len(lk.table_cols)
            for c in lk.input_cols:
                assert c in names, f"lookup {lk.name}: unknown column {c}"
            for c in lk.table_cols:
                assert c in self.fixed, f"lookup {lk.name}: table col {c} " \
                    "must be fixed"
            self._validate_lookup_functional(lk)
        for name, ln in self.instance_len.items():
            assert name in self.instance_names, name
            assert 0 <= ln <= self.usable_rows
        for cp in self.copies:
            assert cp.rows_a.shape == cp.rows_b.shape
            for col, rows in ((cp.col_a, cp.rows_a), (cp.col_b, cp.rows_b)):
                assert col in names
                assert rows.size == 0 or (
                    0 <= rows.min() and rows.max() < self.usable_rows), \
                    f"copy touches non-usable rows in {col}"

    def _validate_lookup_functional(self, lk: "Lookup") -> None:
        """The prover's lookup row permutations sort by the FIRST (key)
        column only (proof/prover.py `_lookup_perm_indices`); grouping the
        permuted inputs A' correctly then requires every other table column
        to be a FUNCTION of the key column (equal keys ⇒ equal rows). True
        for spread tables (spread = interleave(dense)); a table with an
        independent second column would make honest proofs fail to verify —
        reject it loudly at build time instead (VERDICT r3 weak #7).

        Inputs need no separate check: a valid witness's input rows are
        drawn from the table, so they inherit the same dependency, and an
        invalid witness already fails the lookup argument itself."""
        if len(lk.table_cols) < 2:
            return
        key = self.fixed[lk.table_cols[0]]
        kview = key.view(np.uint64).ravel()
        order = np.argsort(kview, kind="stable")
        ks = kview[order]
        same_key = ks[1:] == ks[:-1]
        for c in lk.table_cols[1:]:
            vs = self.fixed[c].view(np.uint64).ravel()[order]
            bad = same_key & (vs[1:] != vs[:-1])
            assert not bad.any(), (
                f"lookup {lk.name}: table column {c!r} is not a function of "
                f"the key column {lk.table_cols[0]!r} (e.g. key "
                f"{int(ks[np.argmax(bad) + 1])} maps to two values) — the "
                "sort-by-key permutation build requires it")


def u64_cols_to_field(F: Field, cols):
    """(..., n, 2) uint32 u64 cell values -> (..., n, 16) Montgomery limbs.

    One batched Montgomery multiply by R² turns raw 64-bit values into
    Montgomery form; this is the single conversion point between witness
    space (u64 pairs) and field space."""
    import jax.numpy as jnp

    limbs4 = u64.to_limbs16(jnp.asarray(cols))           # (..., n, 4)
    pad = jnp.zeros(limbs4.shape[:-1] + (12,), jnp.uint32)
    raw = jnp.concatenate([limbs4, pad], axis=-1)        # (..., n, 16)
    r2 = jnp.broadcast_to(jnp.asarray(F.R2), raw.shape)
    return F.mul(raw, r2)
