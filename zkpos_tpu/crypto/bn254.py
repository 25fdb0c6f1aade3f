"""BN254 (alt_bn128) field and curve arithmetic — pure-Python oracle layer.

This is the *reference / oracle* implementation of the arithmetic the TPU
kernels (zkpos_tpu.ops) implement in limb form.  It is used for:
  * golden-vector generation for kernel tests,
  * the tiny host-side operations of Groth16 (pairing check in Verify,
    G2 ops in Setup for small circuits),
  * serialization (gnark-compatible point encoding).

Parity notes (reference: binance/zkmerkle-proof-of-solvency):
  * the reference's field layer is gnark-crypto `ecc/bn254/fr` / `fp`
    (go.mod:56-57); semantics here match `fr.Element.SetBytes` /
    `Marshal` (big-endian 32-byte, reduced mod r).
"""

from __future__ import annotations

# --- Field moduli -----------------------------------------------------------
# Base field Fp (coordinates of G1/G2) and scalar field Fr (circuit values).
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# BN parameter x such that p(x), r(x) are the BN polynomial evaluations.
BN_X = 4965661367192848881

FR_BYTES = 32
FP_BYTES = 32


def fr_from_bytes(b: bytes) -> int:
    """gnark fr.Element.SetBytes: big-endian bytes reduced mod r."""
    return int.from_bytes(b, "big") % R


def fr_to_bytes(v: int) -> bytes:
    """gnark fr.Element.Marshal / Bytes(): 32-byte big-endian."""
    return (v % R).to_bytes(32, "big")


def fp_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fr_inv(a: int) -> int:
    return pow(a, R - 2, R)


# --- Fp2 = Fp[u]/(u^2+1) ----------------------------------------------------

class Fp2:
    __slots__ = ("c0", "c1")

    def __init__(self, c0: int, c1: int):
        self.c0 = c0 % P
        self.c1 = c1 % P

    ZERO: "Fp2"
    ONE: "Fp2"

    def __add__(self, o: "Fp2") -> "Fp2":
        return Fp2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o: "Fp2") -> "Fp2":
        return Fp2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self) -> "Fp2":
        return Fp2(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fp2(self.c0 * o, self.c1 * o)
        a, b, c, d = self.c0, self.c1, o.c0, o.c1
        ac, bd = a * c, b * d
        return Fp2(ac - bd, (a + b) * (c + d) - ac - bd)

    __rmul__ = __mul__

    def square(self) -> "Fp2":
        a, b = self.c0, self.c1
        return Fp2((a + b) * (a - b), 2 * a * b)

    def inv(self) -> "Fp2":
        a, b = self.c0, self.c1
        t = fp_inv(a * a + b * b)
        return Fp2(a * t, -b * t)

    def conj(self) -> "Fp2":
        return Fp2(self.c0, -self.c1)

    def mul_by_nonresidue(self) -> "Fp2":
        """Multiply by xi = 9 + u (the sextic non-residue for BN254)."""
        a, b = self.c0, self.c1
        return Fp2(9 * a - b, 9 * b + a)

    def is_zero(self) -> bool:
        return self.c0 == 0 and self.c1 == 0

    def __eq__(self, o) -> bool:
        return isinstance(o, Fp2) and self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((self.c0, self.c1))

    def __repr__(self):
        return f"Fp2({self.c0},{self.c1})"

    def pow(self, e: int) -> "Fp2":
        result = Fp2(1, 0)
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result


Fp2.ZERO = Fp2(0, 0)
Fp2.ONE = Fp2(1, 0)

# G2 curve coefficient b' = 3 / (9 + u)
B2 = Fp2(3, 0) * Fp2(9, 1).inv()

# --- Fp6 = Fp2[v]/(v^3 - xi), Fp12 = Fp6[w]/(w^2 - v) -----------------------

class Fp6:
    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0: Fp2, c1: Fp2, c2: Fp2):
        self.c0, self.c1, self.c2 = c0, c1, c2

    ZERO: "Fp6"
    ONE: "Fp6"

    def __add__(self, o):
        return Fp6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fp6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fp6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, Fp2):
            return Fp6(self.c0 * o, self.c1 * o, self.c2 * o)
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = ((a1 + a2) * (b1 + b2) - t1 - t2).mul_by_nonresidue() + t0
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + t2.mul_by_nonresidue()
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fp6(c0, c1, c2)

    def square(self):
        return self * self

    def mul_by_nonresidue(self):
        """Multiply by v."""
        return Fp6(self.c2.mul_by_nonresidue(), self.c0, self.c1)

    def inv(self):
        a0, a1, a2 = self.c0, self.c1, self.c2
        t0 = a0.square() - (a1 * a2).mul_by_nonresidue()
        t1 = a2.square().mul_by_nonresidue() - a0 * a1
        t2 = a1.square() - a0 * a2
        f = (a1 * t2 + a2 * t1).mul_by_nonresidue() + a0 * t0
        finv = f.inv()
        return Fp6(t0 * finv, t1 * finv, t2 * finv)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2

    def __hash__(self):
        return hash((self.c0, self.c1, self.c2))


Fp6.ZERO = Fp6(Fp2.ZERO, Fp2.ZERO, Fp2.ZERO)
Fp6.ONE = Fp6(Fp2.ONE, Fp2.ZERO, Fp2.ZERO)


class Fp12:
    __slots__ = ("c0", "c1")

    def __init__(self, c0: Fp6, c1: Fp6):
        self.c0, self.c1 = c0, c1

    ONE: "Fp12"

    def __mul__(self, o):
        a0, a1, b0, b1 = self.c0, self.c1, o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        c0 = t0 + t1.mul_by_nonresidue()
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1
        return Fp12(c0, c1)

    def square(self):
        return self * self

    def inv(self):
        a0, a1 = self.c0, self.c1
        t = (a0.square() - a1.square().mul_by_nonresidue()).inv()
        return Fp12(a0 * t, -(a1 * t))

    def conj(self) -> "Fp12":
        return Fp12(self.c0, -self.c1)

    def pow(self, e: int) -> "Fp12":
        result = Fp12.ONE
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash((self.c0, self.c1))


Fp12.ONE = Fp12(Fp6.ONE, Fp6.ZERO)


# --- G1 (affine/Jacobian over Fp), y^2 = x^3 + 3 ----------------------------

G1_GEN = (1, 2)
INF1 = None  # point at infinity sentinel for affine tuples


def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - 3) % P == 0


def g1_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * fp_inv(2 * y1) % P
    else:
        lam = (y2 - y1) * fp_inv(x2 - x1) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_neg(a):
    if a is None:
        return None
    return (a[0], (-a[1]) % P)


def g1_mul(a, k: int):
    k %= R
    result = None
    addend = a
    while k:
        if k & 1:
            result = g1_add(result, addend)
        addend = g1_add(addend, addend)
        k >>= 1
    return result


# --- G2 (affine over Fp2), y^2 = x^3 + b' -----------------------------------

G2_GEN = (
    Fp2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fp2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return y.square() == x.square() * x + B2


def g2_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2).is_zero():
            return None
        lam = (x1.square() * 3) * (y1 * 2).inv()
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam.square() - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def g2_neg(a):
    if a is None:
        return None
    return (a[0], -a[1])


def g2_mul(a, k: int):
    k %= R
    result = None
    addend = a
    while k:
        if k & 1:
            result = g2_add(result, addend)
        addend = g2_add(addend, addend)
        k >>= 1
    return result


# --- Optimal ate pairing ----------------------------------------------------
# e(P in G1, Q in G2) -> Fp12.  Loop count 6x+2 for BN curves.

ATE_LOOP_COUNT = 6 * BN_X + 2

# Frobenius coefficients for the twist endomorphism:
#   pi(x, y) = (x^p * gamma12, y^p * gamma13) with
#   gamma12 = xi^((p-1)/3), gamma13 = xi^((p-1)/2) over Fp2.
XI = Fp2(9, 1)
FROB_GAMMA12 = XI.pow((P - 1) // 3)
FROB_GAMMA13 = XI.pow((P - 1) // 2)


def _fp2_frob(a: Fp2) -> Fp2:
    return a.conj()


def _g2_frobenius(q):
    x, y = q
    return (_fp2_frob(x) * FROB_GAMMA12, _fp2_frob(y) * FROB_GAMMA13)


def _sparse_line(coeff_a: Fp2, coeff_b: Fp2, coeff_c: Fp2) -> Fp12:
    """Build the Fp12 element a + b*w + c*w^3 used for line evaluation on the
    D-type twist.  Layout: Fp12 = c0 + c1*w with c_i in Fp6 = (u0, u1, u2)."""
    return Fp12(
        Fp6(coeff_a, Fp2.ZERO, Fp2.ZERO),
        Fp6(coeff_b, coeff_c, Fp2.ZERO),
    )


def _line_double(q, p1):
    """Tangent line at q evaluated at p1 = (xp, yp); returns (2q, line)."""
    x, y = q
    xp, yp = p1
    lam = (x.square() * 3) * (y * 2).inv()
    x3 = lam.square() - x * 2
    y3 = lam * (x - x3) - y
    # line: (lam * x - y) - lam * xq_at_p ... evaluated on G1 point:
    # l(P) = yp - lam * xp - (y - lam * x) as element of Fp12 via twist
    c0 = Fp2(yp, 0)
    c1 = -(lam * xp)
    c2 = lam * x - y
    return (x3, y3), _sparse_line(c0, c1, c2)


def _line_add(q, r_pt, p1):
    """Chord through q, r evaluated at p1; returns (q + r, line)."""
    x1, y1 = q
    x2, y2 = r_pt
    xp, yp = p1
    lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam.square() - x1 - x2
    y3 = lam * (x1 - x3) - y1
    c0 = Fp2(yp, 0)
    c1 = -(lam * xp)
    c2 = lam * x1 - y1
    return (x3, y3), _sparse_line(c0, c1, c2)


def miller_loop(p1, q) -> Fp12:
    if p1 is None or q is None:
        return Fp12.ONE
    t = q
    f = Fp12.ONE
    bits = bin(ATE_LOOP_COUNT)[2:]
    for bit in bits[1:]:
        f = f.square()
        t, line = _line_double(t, p1)
        f = f * line
        if bit == "1":
            t, line = _line_add(t, q, p1)
            f = f * line
    # Frobenius steps
    q1 = _g2_frobenius(q)
    q2 = g2_neg(_g2_frobenius(q1))
    t, line = _line_add(t, q1, p1)
    f = f * line
    _, line = _line_add(t, q2, p1)
    f = f * line
    return f


def final_exponentiation(f: Fp12) -> Fp12:
    """(p^12 - 1)/r exponentiation.  Easy part done with conj/inv; hard part
    as a direct pow (oracle path — speed is irrelevant here)."""
    # Easy part: f^(p^6 - 1) * f^(p^2 + 1)
    f1 = f.conj() * f.inv()          # f^(p^6 - 1)
    f2 = _fp12_frob2(f1) * f1        # ^(p^2 + 1)
    # Hard part: exponent (p^4 - p^2 + 1)/r
    e = (P ** 4 - P ** 2 + 1) // R
    return f2.pow(e)


def _fp12_frob2(a: Fp12) -> Fp12:
    """Frobenius^2 on Fp12 (cheap: conjugation is identity on Fp2^p^2; use
    generic pow as oracle)."""
    return a.pow(P * P)


def pairing(p1, q) -> Fp12:
    """Full pairing e(P, Q)."""
    return final_exponentiation(miller_loop(p1, q))


def multi_pairing(pairs) -> Fp12:
    """prod e(P_i, Q_i): one shared final exponentiation."""
    f = Fp12.ONE
    for p1, q in pairs:
        f = f * miller_loop(p1, q)
    return final_exponentiation(f)
