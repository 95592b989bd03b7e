"""64-bit integer arithmetic emulated with 32-bit limbs in JAX.

TPUs have no 64-bit vector ALU, so every 62-bit modular quantity is carried
as a pair of uint32 limbs ``(lo, hi)``. This module provides wrapping u64
arithmetic and the Montgomery REDC core, written so XLA fuses the whole
limb dance into a handful of vector ops.

The REDC mirrors the reference's 31-bit half-limb formulation
(reference: src/liberate/ntt/ntt_cuda_kernel.cu:12-59) bit-for-bit: for any
inputs, the produced lazy representative in [0, 2q) is identical to the
golden model in liberate_tpu.ntt.golden (itself an exact mirror of the CUDA
kernel). R = 2^62, and the moduli satisfy 4q < R.

Conventions:
- A "u64" is a tuple (lo, hi) of equal-shaped jnp.uint32 arrays.
- Polys are packed as a single jnp.uint32 array of shape [2, C, N]
  (limb-major) — see pack()/unpack().
"""

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
LB_MASK = np.uint32(0x7FFFFFFF)   # low 31 bits
HI62_MASK = np.uint32(0x3FFFFFFF)  # bits 32..61 of a 62-bit value


def pack(lo, hi):
    return jnp.stack([lo, hi], axis=0)


def unpack(x):
    return x[0], x[1]


# -- host conversions --------------------------------------------------------

def from_int64_np(a) -> np.ndarray:
    """numpy int64/uint64/object array -> packed uint32 [2, ...] (two's complement)."""
    a = np.asarray(a)
    if a.dtype == object:
        au = np.array([int(x) & 0xFFFFFFFFFFFFFFFF for x in a.ravel()],
                      dtype=np.uint64).reshape(a.shape)
    else:
        au = a.astype(np.int64).view(np.uint64)
    lo = (au & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (au >> np.uint64(32)).astype(np.uint32)
    return np.stack([lo, hi], axis=0)


def to_int64_np(packed) -> np.ndarray:
    """packed uint32 [2, ...] -> numpy int64 (two's complement)."""
    packed = np.asarray(packed)
    lo = packed[0].astype(np.uint64)
    hi = packed[1].astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.int64)


# -- wrapping u64 primitives ---------------------------------------------------


def add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return lo, ahi + bhi + carry


def add_u32(a, b32):
    alo, ahi = a
    lo = alo + b32
    carry = (lo < alo).astype(U32)
    return lo, ahi + carry


def sub(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo - blo
    borrow = (alo < blo).astype(U32)
    return lo, ahi - bhi - borrow


def mul32_wide(a, b):
    """u32 x u32 -> u64 (exact), via 16-bit half-limbs (4 native muls)."""
    a0 = a & np.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & np.uint32(0xFFFF)
    b1 = b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    t = (m00 >> 16) + (m01 & np.uint32(0xFFFF)) + (m10 & np.uint32(0xFFFF))
    lo = (m00 & np.uint32(0xFFFF)) | (t << 16)
    hi = m11 + (m01 >> 16) + (m10 >> 16) + (t >> 16)
    return lo, hi


def mul_u64_u32_lo(a, b32):
    """(u64 * u32) mod 2^64."""
    alo, ahi = a
    lo, hi = mul32_wide(alo, b32)
    return lo, hi + ahi * b32


def shl(a, n: int):
    """(a << n) mod 2^64, 0 < n < 32."""
    alo, ahi = a
    return alo << n, (ahi << n) | (alo >> (32 - n))


def shr(a, n: int):
    """Logical (a >> n), 0 < n < 32."""
    alo, ahi = a
    return (alo >> n) | (ahi << (32 - n)), ahi >> n


def shr31_to_u32(a):
    """(a >> 31) when the result is known to fit in 32 bits."""
    alo, ahi = a
    return (alo >> 31) | (ahi << 1)


def sar(a, n: int):
    """Arithmetic (a >> n) on the two's-complement u64, 0 < n < 32."""
    alo, ahi = a
    lo = (alo >> n) | (ahi << (32 - n))
    hi = (ahi.astype(jnp.int32) >> n).astype(U32)
    return lo, hi


def lt_signed(a, b):
    """Signed int64 comparison a < b on limb pairs."""
    alo, ahi = a
    blo, bhi = b
    ahs = ahi.astype(jnp.int32)
    bhs = bhi.astype(jnp.int32)
    return (ahs < bhs) | ((ahi == bhi) & (alo < blo))


def lt_unsigned(a, b):
    """Unsigned uint64 comparison a < b on limb pairs."""
    alo, ahi = a
    blo, bhi = b
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def select(mask, a, b):
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def mulhi64(a, b):
    """Upper 64 bits of the exact u64 x u64 product."""
    alo, ahi = a
    blo, bhi = b
    ll = mul32_wide(alo, blo)
    lh = mul32_wide(alo, bhi)
    hl = mul32_wide(ahi, blo)
    hh = mul32_wide(ahi, bhi)
    z = jnp.zeros_like(ll[1])
    # carry out of bits 32..63: (hi32(ll) + lo32(lh) + lo32(hl)) >> 32
    mid = add(add((ll[1], z), (lh[0], z)), (hl[0], z))
    hi = add(hh, (lh[1], z))
    hi = add(hi, (hl[1], z))
    return add(hi, (mid[1], z))


def mullo64(a, b):
    """(a * b) mod 2^64."""
    alo, ahi = a
    blo, bhi = b
    ll = mul32_wide(alo, blo)
    return ll[0], ll[1] + alo * bhi + ahi * blo


def barrett_2q(x, bp, q):
    """x mod q as a [0, 2q) representative, for ANY u64 x, via the
    precomputed reciprocal bp = floor(2^64 / q): r = x - floor-est(x/q)*q.

    The quotient estimate h = floor(x*bp / 2^64) satisfies
    floor(x/q) - 1 <= h <= floor(x/q), so r is in [0, 2q). This is
    shoup_mul with w = 1 (the mullo64(x, 1) elided) — the cheap unsigned
    "reduce an arbitrary u64 into the lazy window" op the Shoup-form
    pointwise chains use in place of a Montgomery enter.
    """
    h = mulhi64(x, bp)
    return sub(x, mullo64(h, q))


def shoup_mul(x, w, wp, q):
    """Modular multiply by the CONSTANT w via Shoup's precomputed
    quotient wp = floor(w * 2^64 / q): r = w*x - floor(wp*x / 2^64)*q.

    For ANY x < 2^64 the result is in [0, 2q) and congruent to w*x mod q
    (the quotient estimate is off by at most 1). ~2.4x faster than the
    Montgomery multiply on the v5e VPU (benchmarks/ntt_probe6.py): three
    64-bit limb products with short carry chains instead of the REDC's
    long serial chain. Note the operand domain differs from montmul —
    montmul(x, w_mont) returns w*x*R^-1*R = w*x only when the twiddle is
    pre-entered; shoup_mul takes the PLAIN constant.
    """
    hi_est = mulhi64(x, wp)
    return sub(mullo64(x, w), mullo64(hi_est, q))


# ---------------------------------------------------------------------------
# Montgomery core. Constants ql/qh/kl/kh are uint32 (31-bit half limbs of q
# and k = -q^{-1} mod 2^62), broadcastable against the data.
# ---------------------------------------------------------------------------


def montmul(a, b, ql, qh, kl, kh):
    """Montgomery multiply for non-negative a, b < 2^62.

    Returns a*b*R^{-1} mod q as the identical lazy representative the
    reference CUDA core produces (result < 2q when a, b < 2q).
    """
    alo, ahi = a
    blo, bhi = b

    al = alo & LB_MASK
    ah = (alo >> 31) | (ahi << 1)     # < 2^31 for a < 2^62
    bl = blo & LB_MASK
    bh = (blo >> 31) | (bhi << 1)

    alpha = mul32_wide(ah, bh)
    beta = add(mul32_wide(ah, bl), mul32_wide(al, bh))
    gamma = mul32_wide(al, bl)        # < 2^62

    gammal = gamma[0] & LB_MASK
    gammah = shr31_to_u32(gamma)      # < 2^31
    betal = beta[0] & LB_MASK
    betah = shr(beta, 31)             # beta < 2^63 -> betah < 2^32; keep u64

    # s = x*k mod 2^62
    upper = add(mul32_wide(gammal, kh), mul32_wide(gammah + betal, kl))
    s = add(shl(upper, 31), mul32_wide(gammal, kl))
    s = (s[0], s[1] & HI62_MASK)

    sl = s[0] & LB_MASK
    sh = shr31_to_u32(s)              # < 2^31
    sqb = add(mul32_wide(sh, ql), mul32_wide(sl, qh))
    sqbl = sqb[0] & LB_MASK
    sqbh = shr(sqb, 31)               # < 2^32; keep u64

    carry = shr31_to_u32(add(gamma, mul32_wide(sl, ql)))  # < 2^32
    # carry + betal + sqbl can exceed 2^32: form as u64 then shift.
    c2 = add_u32(add_u32((carry, jnp.zeros_like(carry)), betal), sqbl)
    carry2 = shr31_to_u32(c2)

    res = add(alpha, betah)
    res = add(res, sqbh)
    res = add_u32(res, carry2)
    res = add(res, mul32_wide(sh, qh))
    return res


def montmul_signed(a, b, ql, qh, kl, kh):
    """Montgomery multiply where ``a`` may be any two's-complement int64.

    Mirrors the CUDA kernel's int64 semantics (arithmetic shift of ``a``)
    so that wrapped-negative inputs — e.g. the divided differences in basis
    extension (reference: ckks_engine.py:654-705) — give bit-identical
    results. ``b`` must be non-negative < 2^62 (always a table constant).
    """
    alo, ahi = a
    blo, bhi = b

    al = alo & LB_MASK
    # ah = a >> 31 (arithmetic), a full u64.
    ah = ((alo >> 31) | (ahi << 1), (ahi.astype(jnp.int32) >> 31).astype(U32))
    bl = blo & LB_MASK
    bh = (blo >> 31) | (bhi << 1)

    alpha = mul_u64_u32_lo(ah, bh)
    beta = add(mul_u64_u32_lo(ah, bl), mul32_wide(al, bh))
    gamma = mul32_wide(al, bl)

    gammal = gamma[0] & LB_MASK
    gammah = shr31_to_u32(gamma)
    betal = beta[0] & LB_MASK
    betah = sar(beta, 31)             # arithmetic: beta may be "negative"

    upper = add(mul32_wide(gammal, kh), mul32_wide(gammah + betal, kl))
    s = add(shl(upper, 31), mul32_wide(gammal, kl))
    s = (s[0], s[1] & HI62_MASK)

    sl = s[0] & LB_MASK
    sh = shr31_to_u32(s)
    sqb = add(mul32_wide(sh, ql), mul32_wide(sl, qh))
    sqbl = sqb[0] & LB_MASK
    sqbh = shr(sqb, 31)

    # (gamma + sl*ql) is non-negative < 2^63: logical shift.
    carry = shr31_to_u32(add(gamma, mul32_wide(sl, ql)))
    c2 = add_u32(add_u32((carry, jnp.zeros_like(carry)), betal), sqbl)
    carry2 = shr31_to_u32(c2)

    res = add(alpha, betah)
    res = add(res, sqbh)
    res = add_u32(res, carry2)
    res = add(res, mul32_wide(sh, qh))
    return res


def montredc_signed(a, ql, qh, kl, kh):
    """Montgomery reduction where ``a`` may be any two's-complement int64.

    Mirrors the CUDA kernel's int64 semantics (arithmetic shifts) for the
    mod-down path of key switching, where inputs can be wrapped-negative
    (reference: ntt_cuda_kernel.cu:560-607 used at ckks_engine.py:893-901).
    """
    alo, ahi = a
    xl = alo & LB_MASK
    xh = sar(a, 31)                   # full u64, sign-extended

    xkb = add(mul_u64_u32_lo(xh, kl), mul32_wide(xl, kh))
    s = add(shl(xkb, 31), mul32_wide(xl, kl))
    s = (s[0], s[1] & HI62_MASK)

    sl = s[0] & LB_MASK
    sh = shr31_to_u32(s)
    sqb = add(mul32_wide(sh, ql), mul32_wide(sl, qh))
    sqbl = sqb[0] & LB_MASK
    sqbh = shr(sqb, 31)

    carry = sar(add(a, mul32_wide(sl, ql)), 31)
    carry2 = sar(add_u32(carry, sqbl), 31)

    res = add(sqbh, mul32_wide(sh, qh))
    res = add(res, carry2)
    return res


def montredc(a, ql, qh, kl, kh):
    """Montgomery reduction a*R^{-1} mod q for non-negative a < 2^62.

    Mirrors mont_redc_cuda_kernel (reference: ntt_cuda_kernel.cu:560-607).
    """
    alo, ahi = a
    xl = alo & LB_MASK
    xh = (alo >> 31) | (ahi << 1)

    xkb = add(mul32_wide(xh, kl), mul32_wide(xl, kh))
    s = add(shl(xkb, 31), mul32_wide(xl, kl))
    s = (s[0], s[1] & HI62_MASK)

    sl = s[0] & LB_MASK
    sh = shr31_to_u32(s)
    sqb = add(mul32_wide(sh, ql), mul32_wide(sl, qh))
    sqbl = sqb[0] & LB_MASK
    sqbh = shr(sqb, 31)

    carry = shr31_to_u32(add(a, mul32_wide(sl, ql)))
    c2 = add_u32((carry, jnp.zeros_like(carry)), sqbl)
    carry2 = shr31_to_u32(c2)

    res = add(sqbh, mul32_wide(sh, qh))
    res = add_u32(res, carry2)
    return res


def shoup_quotient(x, q):
    """Elementwise floor(x * 2^64 / q) for 0 <= x < q < 2^63, by 64-step
    binary long division on the limb pairs. Device-friendly (a
    lax.fori_loop of ~15 vector ops per step) — used once per key to
    precompute Shoup quotients for the key-switching tables
    (config.use_shoup_ksk); hot paths never run this.

    x, q: broadcast-compatible limb pairs. Returns a limb pair.
    """
    import jax

    def body(_, st):
        r_lo, r_hi, w_lo, w_hi = st
        r = shl((r_lo, r_hi), 1)
        ge = ~lt_unsigned(r, q)
        r = select(ge, sub(r, q), r)
        w = shl((w_lo, w_hi), 1)
        return (r[0], r[1], w[0] | ge.astype(jnp.uint32), w[1])

    z = jnp.zeros_like(x[0] | x[1])
    st = jax.lax.fori_loop(
        0, 64, body, (x[0] | z, x[1] | z, z, z))
    return (st[2], st[3])
