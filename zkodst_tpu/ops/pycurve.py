"""Host-side BN254 curve reference arithmetic (Python ints).

The role of `halo2curves` bn256 point types (SURVEY.md §2.3 N6/N8) on the
host: test oracle for the JAX G1 kernels, G2/Fq2 arithmetic for the verifier
key, and (in proof/pairing.py) the optimal-ate pairing for real verification.

G1: y^2 = x^3 + 3 over Fq, generator (1, 2).
G2: y^2 = x^3 + 3/(9+u) over Fq2 = Fq[u]/(u^2+1).

All constants are validated at import (on-curve + subgroup-order checks), so
a wrong constant fails fast rather than producing bad proofs.
"""

from __future__ import annotations

from .pyfield import FQ, FR

P = FQ.p
R_ORDER = FR.p  # group order of G1/G2 subgroups

B1 = 3

# ---------------------------------------------------------------------------
# Fq2 = Fq[u] / (u^2 + 1); elements (c0, c1) = c0 + c1*u
# ---------------------------------------------------------------------------


def fq2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fq2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u) = a0b0 - a1b1 + (a0b1 + a1b0) u
    return ((a[0] * b[0] - a[1] * b[1]) % P,
            (a[0] * b[1] + a[1] * b[0]) % P)


def fq2_smul(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fq2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
    d = pow((a[0] * a[0] + a[1] * a[1]) % P, P - 2, P)
    return (a[0] * d % P, (-a[1] * d) % P)


FQ2_ZERO = (0, 0)
FQ2_ONE = (1, 0)

# b for G2: 3 / (9 + u)
B2 = fq2_mul((3, 0), fq2_inv((9, 1)))

# Standard BN254 G2 generator (c0, c1 ordering), as used across the Ethereum
# ecosystem; validated below.
G2_GEN = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)

G1_GEN = (1, 2)


# ---------------------------------------------------------------------------
# Generic short-Weierstrass group ops in affine coords over any field with
# dict-style ops. We instantiate for Fq (G1) and Fq2 (G2). Points are
# (x, y) tuples or None for the identity.
# ---------------------------------------------------------------------------

class Group:
    def __init__(self, add, sub, mul, inv, neg, smul, zero, one, b,
                 order: int = None):
        self.fadd, self.fsub, self.fmul = add, sub, mul
        self.finv, self.fneg, self.fsmul = inv, neg, smul
        self.fzero, self.fone, self.b = zero, one, b
        self.order = order if order is not None else R_ORDER

    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        lhs = self.fmul(y, y)
        rhs = self.fadd(self.fmul(self.fmul(x, x), x), self.b)
        return lhs == rhs

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if y1 != y2 or y1 == self.fzero:
                return None
            # doubling
            lam = self.fmul(self.fsmul(self.fmul(x1, x1), 3),
                            self.finv(self.fsmul(y1, 2)))
        else:
            lam = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsub(self.fmul(lam, lam), x1), x2)
        y3 = self.fsub(self.fmul(lam, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def neg(self, p):
        if p is None:
            return None
        return (p[0], self.fneg(p[1]))

    # -- Jacobian-coordinate internals for scalar multiplication ---------
    # The affine add() above pays one field inversion (a ~250-squaring
    # Fermat pow for Fq) PER ADDITION; a 254-bit double-and-add was
    # ~100 ms, and the IPA prove/verify paths issue dozens of host muls
    # (4/round in open_poly, ~40 in verify_claims_compressed). Jacobian
    # mul defers to ONE inversion at the end (~2 ms/mul measured).
    # Formulas: dbl-2009-l / add-2007-bl (a = 0 curves; EFD).

    def _jdbl(self, pt):
        X1, Y1, Z1 = pt
        mul, add, sub, smul = self.fmul, self.fadd, self.fsub, self.fsmul
        A = mul(X1, X1)
        B = mul(Y1, Y1)
        C = mul(B, B)
        t = sub(sub(mul(add(X1, B), add(X1, B)), A), C)
        D = smul(t, 2)
        E = smul(A, 3)
        F = mul(E, E)
        X3 = sub(F, smul(D, 2))
        Y3 = sub(mul(E, sub(D, X3)), smul(C, 8))
        Z3 = smul(mul(Y1, Z1), 2)
        return (X3, Y3, Z3)

    def _jadd(self, p, q):
        if p is None:
            return q
        if q is None:
            return p
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        mul, add, sub, smul = self.fmul, self.fadd, self.fsub, self.fsmul
        Z1Z1 = mul(Z1, Z1)
        Z2Z2 = mul(Z2, Z2)
        U1 = mul(X1, Z2Z2)
        U2 = mul(X2, Z1Z1)
        S1 = mul(mul(Y1, Z2), Z2Z2)
        S2 = mul(mul(Y2, Z1), Z1Z1)
        H = sub(U2, U1)
        if H == self.fzero:
            if S1 == S2:
                return self._jdbl(p)
            return None
        I = mul(smul(H, 2), smul(H, 2))
        J = mul(H, I)
        r = smul(sub(S2, S1), 2)
        V = mul(U1, I)
        X3 = sub(sub(mul(r, r), J), smul(V, 2))
        Y3 = sub(mul(r, sub(V, X3)), smul(mul(S1, J), 2))
        Z3 = mul(sub(sub(mul(add(Z1, Z2), add(Z1, Z2)), Z1Z1), Z2Z2), H)
        return (X3, Y3, Z3)

    def mul(self, p, k: int):
        k %= self.order
        if p is None or k == 0:
            return None
        acc, base = None, (p[0], p[1], self.fone)
        while k:
            if k & 1:
                acc = self._jadd(acc, base)
            if k != 1:
                base = self._jdbl(base)
            k >>= 1
        if acc is None or acc[2] == self.fzero:
            return None
        zinv = self.finv(acc[2])
        zinv2 = self.fmul(zinv, zinv)
        return (self.fmul(acc[0], zinv2),
                self.fmul(acc[1], self.fmul(zinv2, zinv)))


def _fq_smul(a, k):
    return a * k % P


G1 = Group(lambda a, b: (a + b) % P, lambda a, b: (a - b) % P,
           lambda a, b: a * b % P, lambda a: pow(a, P - 2, P),
           lambda a: (-a) % P, _fq_smul, 0, 1, B1)

G2 = Group(fq2_add, fq2_sub, fq2_mul, fq2_inv, fq2_neg, fq2_smul,
           FQ2_ZERO, FQ2_ONE, B2)

assert G1.is_on_curve(G1_GEN), "G1 generator not on curve"
assert G2.is_on_curve(G2_GEN), "G2 generator not on curve"
assert G1.mul(G1_GEN, R_ORDER) is None, "G1 generator has wrong order"
assert G2.mul(G2_GEN, R_ORDER) is None, "G2 generator has wrong order"


# ---------------------------------------------------------------------------
# Pasta: the "pallas" curve of the reference's circuit crate
# (pasta_curves pallas::Point — y² = x³ + 5 over PALLAS_BASE, scalar field
# VESTA_BASE, cofactor 1; generator (-1, 2); table16.rs:93-98)
# ---------------------------------------------------------------------------

from .pyfield import PALLAS_BASE, VESTA_BASE  # noqa: E402

_PP = PALLAS_BASE
PASTA_G1 = Group(lambda a, b: (a + b) % _PP, lambda a, b: (a - b) % _PP,
                 lambda a, b: a * b % _PP, lambda a: pow(a, _PP - 2, _PP),
                 lambda a: (-a) % _PP, lambda a, k: a * k % _PP,
                 0, 1, 5, order=VESTA_BASE)
PASTA_G1_GEN = (_PP - 1, 2)

assert PASTA_G1.is_on_curve(PASTA_G1_GEN), "Pasta generator not on curve"
assert PASTA_G1.mul(PASTA_G1_GEN, VESTA_BASE) is None, \
    "Pasta generator has wrong order"
