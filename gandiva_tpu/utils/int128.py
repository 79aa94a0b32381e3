"""Vectorized int128 arithmetic as (hi: int64, lo: uint64-in-int64) limb pairs.

Foundation for the decimal128 subsystem (reference: gandiva's decimal_ir.cc /
decimal_ops.cc operate on __int128 in LLVM IR — SURVEY.md §2a#12). TPU has no
128-bit type, and no 64-bit bitcasts (utils/bits.py), so everything here is
built from 64-bit *arithmetic* (which XLA emulates on 32-bit lanes) plus
32-bit half-word decomposition for the 64×64→128 product.

Convention: a signed int128 value v = hi * 2^64 + lo, with hi carried as
int64 (two's complement) and lo carried as uint64 *stored in an int64 array*
(astype-wrap; the bit pattern is what matters). All functions are
elementwise-vectorized over arrays.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_M32 = jnp.uint64(0xFFFF_FFFF)


def _u(x):
    return x.astype(jnp.uint64)


def _s(x):
    return x.astype(jnp.int64)


def from_int64(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int64 → int128 (sign-extended)."""
    hi = jnp.where(x < 0, jnp.int64(-1), jnp.int64(0))
    return hi, x


def to_int64(hi, lo):
    """Truncating: low 64 bits reinterpreted signed."""
    return lo


def is_neg(hi, lo):
    return hi < 0


def neg128(hi, lo):
    """Two's complement negate: (~hi + carry, -lo); carry iff lo == 0."""
    nlo = _s(jnp.uint64(0) - _u(lo))
    nhi = _s((~_u(hi)) + (_u(lo) == 0).astype(jnp.uint64))
    return nhi, nlo


def abs128(hi, lo):
    n = is_neg(hi, lo)
    ahi, alo = neg128(hi, lo)
    return jnp.where(n, ahi, hi), jnp.where(n, alo, lo)


def add128(ahi, alo, bhi, blo):
    lo = _u(alo) + _u(blo)
    carry = (lo < _u(alo)).astype(jnp.uint64)
    hi = _s(_u(ahi) + _u(bhi) + carry)
    return hi, _s(lo)


def sub128(ahi, alo, bhi, blo):
    nh, nl = neg128(bhi, blo)
    return add128(ahi, alo, nh, nl)


def cmp128(ahi, alo, bhi, blo):
    """-1 / 0 / +1 signed comparison."""
    hi_lt = ahi < bhi
    hi_gt = ahi > bhi
    lo_lt = _u(alo) < _u(blo)
    lo_gt = _u(alo) > _u(blo)
    return jnp.where(hi_lt, -1, jnp.where(hi_gt, 1,
                     jnp.where(lo_lt, -1, jnp.where(lo_gt, 1, 0)))
                     ).astype(jnp.int32)


def mul_u64(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unsigned 64×64 → 128 via 32-bit halves (uint64 ops only)."""
    a, b = _u(a), _u(b)
    a0, a1 = a & _M32, a >> jnp.uint64(32)
    b0, b1 = b & _M32, b >> jnp.uint64(32)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> jnp.uint64(32)) + (p01 & _M32) + (p10 & _M32)
    lo = (p00 & _M32) | (mid << jnp.uint64(32))
    hi = p11 + (p01 >> jnp.uint64(32)) + (p10 >> jnp.uint64(32)) \
        + (mid >> jnp.uint64(32))
    return _s(hi), _s(lo)


def mul128_i64(hi, lo, m):
    """int128 × int64 → int128 (truncating at 128 bits)."""
    sign = jnp.logical_xor(is_neg(hi, lo), m < 0)
    ahi, alo = abs128(hi, lo)
    am = jnp.abs(m)
    phi, plo = mul_u64(alo, am)
    phi = _s(_u(phi) + _u(ahi) * _u(am))  # ahi*am adds into the high limb
    nh, nl = neg128(phi, plo)
    return jnp.where(sign, nh, phi), jnp.where(sign, nl, plo)


def mul_i64(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Signed 64×64 → 128."""
    sign = jnp.logical_xor(a < 0, b < 0)
    hi, lo = mul_u64(jnp.abs(a), jnp.abs(b))
    nh, nl = neg128(hi, lo)
    return jnp.where(sign, nh, hi), jnp.where(sign, nl, lo)


def shl128(hi, lo, k: int):
    """Left shift by a static 0..63 amount."""
    if k == 0:
        return hi, lo
    uk = jnp.uint64(k)
    hi2 = _s((_u(hi) << uk) | (_u(lo) >> jnp.uint64(64 - k)))
    lo2 = _s(_u(lo) << uk)
    return hi2, lo2


def shr128u(hi, lo, k: int):
    """Logical right shift by a static 0..63 amount."""
    if k == 0:
        return hi, lo
    uk = jnp.uint64(k)
    lo2 = _s((_u(lo) >> uk) | (_u(hi) << jnp.uint64(64 - k)))
    hi2 = _s(_u(hi) >> uk)
    return hi2, lo2


def divmod128(ahi, alo, bhi, blo):
    """Signed int128 ÷ int128 → (q_hi, q_lo, r_hi, r_lo); C semantics
    (truncation toward zero, remainder sign = dividend sign).

    Bitwise restoring division on 128-bit remainder, 128 iterations."""
    qsign = jnp.logical_xor(is_neg(ahi, alo), is_neg(bhi, blo))
    rsign = is_neg(ahi, alo)
    uhi, ulo = abs128(ahi, alo)
    dhi, dlo = abs128(bhi, blo)

    def body(i, state):
        qhi, qlo, rhi, rlo = state
        bit_idx = 127 - i
        bit = jnp.where(
            bit_idx >= 64,
            (_u(uhi) >> (jnp.uint64(bit_idx - 64) % jnp.uint64(64)))
            & jnp.uint64(1),
            (_u(ulo) >> (jnp.uint64(bit_idx) % jnp.uint64(64)))
            & jnp.uint64(1))
        # r = (r << 1) | bit
        rhi2 = (_u(rhi) << jnp.uint64(1)) | (_u(rlo) >> jnp.uint64(63))
        rlo2 = (_u(rlo) << jnp.uint64(1)) | bit
        # ge = r >= d (unsigned 128)
        ge = (rhi2 > _u(dhi)) | ((rhi2 == _u(dhi)) & (rlo2 >= _u(dlo)))
        # r -= d where ge
        sub_lo = rlo2 - _u(dlo)
        borrow = (rlo2 < _u(dlo)).astype(jnp.uint64)
        sub_hi = rhi2 - _u(dhi) - borrow
        rhi3 = jnp.where(ge, sub_hi, rhi2)
        rlo3 = jnp.where(ge, sub_lo, rlo2)
        qhi2 = (_u(qhi) << jnp.uint64(1)) | (_u(qlo) >> jnp.uint64(63))
        qlo2 = (_u(qlo) << jnp.uint64(1)) | ge.astype(jnp.uint64)
        return _s(qhi2), _s(qlo2), _s(rhi3), _s(rlo3)

    z = jnp.zeros_like(alo)
    qhi, qlo, rhi, rlo = lax.fori_loop(0, 128, body, (z, z, z, z))
    nqh, nql = neg128(qhi, qlo)
    nrh, nrl = neg128(rhi, rlo)
    qhi = jnp.where(qsign, nqh, qhi)
    qlo = jnp.where(qsign, nql, qlo)
    rhi = jnp.where(rsign, nrh, rhi)
    rlo = jnp.where(rsign, nrl, rlo)
    return qhi, qlo, rhi, rlo


# powers of ten up to 10^38 as (hi, lo) int64 pairs (host-computed)
POW10_HI = tuple((10 ** i) >> 64 for i in range(39))
POW10_LO = tuple(((10 ** i) & 0xFFFF_FFFF_FFFF_FFFF) - (1 << 64)
                 if ((10 ** i) & 0xFFFF_FFFF_FFFF_FFFF) >= (1 << 63)
                 else ((10 ** i) & 0xFFFF_FFFF_FFFF_FFFF)
                 for i in range(39))


def pow10_128(k: int) -> Tuple[int, int]:
    """(hi, lo) python ints (lo already wrapped to signed) for 10^k."""
    return POW10_HI[k], POW10_LO[k]


def mul_pow10(hi, lo, k: int):
    """int128 × 10^k for static k (k ≤ 38), truncating at 128 bits."""
    for _ in range(k):
        # ×10 = ×8 + ×2 (shifts + add)
        h8, l8 = shl128(hi, lo, 3)
        h2, l2 = shl128(hi, lo, 1)
        hi, lo = add128(h8, l8, h2, l2)
    return hi, lo


def div_pow10_round(hi, lo, k: int):
    """int128 ÷ 10^k with round-half-away-from-zero (Java/Gandiva scale
    reduction semantics), for static k."""
    if k == 0:
        return hi, lo
    sign = is_neg(hi, lo)
    ahi, alo = abs128(hi, lo)
    ph, pl = pow10_128(k)
    phj = jnp.full_like(hi, ph)
    plj = jnp.full_like(lo, pl)
    qhi, qlo, rhi, rlo = divmod128(ahi, alo, phj, plj)
    # round: r*2 >= 10^k ?
    r2h, r2l = shl128(rhi, rlo, 1)
    ge = (cmp128(r2h, r2l, phj, plj) >= 0)
    one = jnp.ones_like(qlo)
    zero = jnp.zeros_like(qlo)
    qhi, qlo = add128(qhi, qlo, jnp.where(ge, zero, zero),
                      jnp.where(ge, one, zero))
    nh, nl = neg128(qhi, qlo)
    return jnp.where(sign, nh, qhi), jnp.where(sign, nl, qlo)


def mul256_div_pow10(ahi, alo, bhi, blo, k: int):
    """(a × b) ÷ 10^k with round-half-away-from-zero, via a full 256-bit
    intermediate product — the reference's ``decimal_xlarge`` path
    (apache/arrow cpp/src/gandiva/decimal_xlarge.cc ⚠, SURVEY.md §2a#12):
    used when BOTH decimal multiply operands exceed 18 digits, so the raw
    product can reach 10^77 and must be formed at 256 bits before the
    scale-reduction divide. Quotient truncates to 128 bits (a product whose
    rescaled value still exceeds 38 digits wraps, like the other kernels).

    All arithmetic on 32-bit limbs in uint64 lanes (TPU-lowerable):
    schoolbook 4×4-limb multiply into 8 columns, one carry sweep, then
    round(x/10^k) = floor((x + 5·10^(k-1)) / 10^k) on the magnitude —
    the divide chains ≤10^9 scalar divisors so every long-division step
    fits ((r << 32) | limb < 2^62)."""
    M = jnp.uint64(0xFFFF_FFFF)
    S32 = jnp.uint64(32)
    sign = jnp.logical_xor(is_neg(ahi, alo), is_neg(bhi, blo))
    Ah, Al = abs128(ahi, alo)
    Bh, Bl = abs128(bhi, blo)

    def split32(hi_, lo_):
        uh, ul = _u(hi_), _u(lo_)
        return [ul & M, ul >> S32, uh & M, uh >> S32]

    a = split32(Ah, Al)
    b = split32(Bh, Bl)
    col = [0] * 8
    for i in range(4):
        for j in range(4):
            p = a[i] * b[j]                       # < 2^64 - 2^33
            col[i + j] = col[i + j] + (p & M)
            if i + j + 1 < 8:
                col[i + j + 1] = col[i + j + 1] + (p >> S32)
    limbs = []
    carry = jnp.uint64(0)
    for c in col:                                 # ≤ 8 sub-2^32 terms + carry
        t = c + carry
        limbs.append(t & M)
        carry = t >> S32
    if k > 0:
        half = 5 * 10 ** (k - 1)                  # 10^k / 2, exact
        carry = jnp.uint64(0)
        for idx in range(8):
            t = limbs[idx] + jnp.uint64((half >> (32 * idx)) & 0xFFFF_FFFF) \
                + carry
            limbs[idx] = t & M
            carry = t >> S32
        left = k
        while left > 0:
            step = min(left, 9)
            left -= step
            d = jnp.uint64(10 ** step)
            r = jnp.uint64(0) * limbs[0]          # broadcast zero
            for idx in range(7, -1, -1):
                t = (r << S32) | limbs[idx]
                limbs[idx] = t // d
                r = t % d
    lo = _s(limbs[0] | (limbs[1] << S32))
    hi = _s(limbs[2] | (limbs[3] << S32))
    nh, nl = neg128(hi, lo)
    return jnp.where(sign, nh, hi), jnp.where(sign, nl, lo)


def to_float64(hi, lo):
    """int128 → float64 (approximate, for casts)."""
    sign = is_neg(hi, lo)
    ahi, alo = abs128(hi, lo)
    f = _u(ahi).astype(jnp.float64) * jnp.float64(2.0) ** 64 \
        + _u(alo).astype(jnp.float64)
    return jnp.where(sign, -f, f)
