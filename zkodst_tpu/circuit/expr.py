"""Polynomial-constraint expression AST.

The TPU-native replacement for halo2's `Expression` tree
(reference: halo2_proofs `plonk::Expression`, driven by the gate builders at
/root/reference/blake2f-circuit/src/blake2f/table16/compression.rs:605-1056).
Unlike halo2's cell-oriented gates, an expression here is evaluated
**vectorized over every row at once**: `Var(col, rot)` resolves to a whole
column tensor rotated by `rot`, and field ops are the batched limb kernels
from :mod:`..ops.field`. The same tree is used by the mock checker (base
domain) and the prover's quotient construction (extended coset domain).

Build expressions with Python operators::

    V("d0") + V("d1", 1) * (1 << 16) - V("w")

Integer constants are Python ints (arbitrary precision), reduced mod p at
evaluation time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp


class Expr:
    """Base class; supports +, -, *, unary -, and int mixing."""

    def __add__(self, o):
        return Add(self, _wrap(o))

    def __radd__(self, o):
        return Add(_wrap(o), self)

    def __sub__(self, o):
        return Add(self, Neg(_wrap(o)))

    def __rsub__(self, o):
        return Add(_wrap(o), Neg(self))

    def __mul__(self, o):
        return Mul(self, _wrap(o))

    def __rmul__(self, o):
        return Mul(_wrap(o), self)

    def __neg__(self):
        return Neg(self)

    def degree(self) -> int:
        raise NotImplementedError

    def vars(self) -> set:
        raise NotImplementedError


def _wrap(x) -> "Expr":
    if isinstance(x, Expr):
        return x
    if isinstance(x, int):
        return Const(x)
    raise TypeError(f"cannot use {type(x)} in an expression")


@dataclass(frozen=True)
class Var(Expr):
    """A column reference at a relative row rotation (halo2 `query_advice`)."""

    col: str
    rot: int = 0

    def degree(self):
        return 1

    def vars(self):
        return {(self.col, self.rot)}


def V(col: str, rot: int = 0) -> Var:
    return Var(col, rot)


@dataclass(frozen=True)
class Const(Expr):
    value: int

    def degree(self):
        return 0

    def vars(self):
        return set()


@dataclass(frozen=True)
class Add(Expr):
    a: Expr
    b: Expr

    def degree(self):
        return max(self.a.degree(), self.b.degree())

    def vars(self):
        return self.a.vars() | self.b.vars()


@dataclass(frozen=True)
class Mul(Expr):
    a: Expr
    b: Expr

    def degree(self):
        return self.a.degree() + self.b.degree()

    def vars(self):
        return self.a.vars() | self.b.vars()


@dataclass(frozen=True)
class Neg(Expr):
    a: Expr

    def degree(self):
        return self.a.degree()

    def vars(self):
        return self.a.vars()


def eval_expr(e: Expr, F, getcol: Callable[[str, int], Any], cache=None):
    """Evaluate over whole columns.

    Args:
      e: expression tree.
      F: ops.field.Field.
      getcol: (col, rot) -> (..., n, L) Montgomery limb tensor.
      cache: optional dict for shared-subtree memoization (keyed by the
        frozen dataclass value, so structurally equal subtrees share work).

    Returns (..., n, L) Montgomery limbs of the expression value per row.
    """
    if cache is None:
        cache = {}

    def rec(node):
        key = node
        hit = cache.get(key)
        if hit is not None:
            return hit
        if isinstance(node, Var):
            out = getcol(node.col, node.rot)
        elif isinstance(node, Const):
            out = jnp.asarray(F.from_int(node.value))
        elif isinstance(node, Add):
            a, b = rec(node.a), rec(node.b)
            out = F.add(*jnp.broadcast_arrays(a, b))
        elif isinstance(node, Mul):
            a, b = rec(node.a), rec(node.b)
            out = F.mul(*jnp.broadcast_arrays(a, b))
        elif isinstance(node, Neg):
            out = F.neg(rec(node.a))
        else:
            raise TypeError(f"unknown expr node {type(node)}")
        cache[key] = out
        return out

    return rec(e)
