"""Golden (oracle) model of the modular arithmetic core, in NumPy int64.

This module mirrors — operation for operation, including lazy-reduction
representatives and two's-complement wraparound — the semantics of the
reference CUDA kernels (reference: src/liberate/ntt/ntt_cuda_kernel.cu).
It exists so that every JAX/Pallas kernel in this framework can be tested
for bit-exactness against plain NumPy on the host.

All polys are int64 arrays of shape [C, N] (C = RNS channels). Values are
"lazy" residues in [0, 2q) unless stated otherwise. numpy int64 arithmetic
wraps around exactly like the CUDA int64 arithmetic, and ``>>`` on int64 is
an arithmetic shift — both properties the Montgomery core relies on.
"""

import numpy as np

HALF_NBITS = 31
NBITS = 62
LB_MASK = np.int64((1 << HALF_NBITS) - 1)
FB_MASK = np.int64((1 << NBITS) - 1)

_I64 = np.int64

# Silence expected overflow warnings: wraparound is intentional.
_ERR = {"over": "ignore"}


def mont_mult(a, b, ql, qh, kl, kh):
    """Montgomery multiply: returns a*b*R^{-1} mod q, lazy in [0, 2q).

    Bit-exact mirror of mont_mult_scalar_cuda_kernel
    (reference: ntt_cuda_kernel.cu:12-59). ql/qh/kl/kh are the 31-bit
    half-limbs of q and k = -q^{-1} mod R, R = 2^62, broadcastable to a.
    """
    a = np.asarray(a, dtype=_I64)
    b = np.asarray(b, dtype=_I64)
    ql = np.asarray(ql, dtype=_I64)
    qh = np.asarray(qh, dtype=_I64)
    kl = np.asarray(kl, dtype=_I64)
    kh = np.asarray(kh, dtype=_I64)

    with np.errstate(**_ERR):
        al = a & LB_MASK
        ah = a >> HALF_NBITS  # arithmetic shift
        bl = b & LB_MASK
        bh = b >> HALF_NBITS

        alpha = ah * bh
        beta = ah * bl + al * bh
        gamma = al * bl

        gammal = gamma & LB_MASK
        gammah = gamma >> HALF_NBITS
        betal = beta & LB_MASK
        betah = beta >> HALF_NBITS

        upper = gammal * kh
        upper = upper + (gammah + betal) * kl
        upper = upper << HALF_NBITS
        s = upper + gammal * kl
        s = s & FB_MASK

        sl = s & LB_MASK
        sh = s >> HALF_NBITS
        sqb = sh * ql + sl * qh
        sqbl = sqb & LB_MASK
        sqbh = sqb >> HALF_NBITS

        carry = (gamma + sl * ql) >> HALF_NBITS
        carry = (carry + betal + sqbl) >> HALF_NBITS

        return alpha + betah + sqbh + carry + sh * qh


def mont_redc(a, ql, qh, kl, kh):
    """Montgomery reduce: a*R^{-1} mod q (reference: ntt_cuda_kernel.cu:560-607)."""
    a = np.asarray(a, dtype=_I64)
    ql = np.asarray(ql, dtype=_I64)
    qh = np.asarray(qh, dtype=_I64)
    kl = np.asarray(kl, dtype=_I64)
    kh = np.asarray(kh, dtype=_I64)
    with np.errstate(**_ERR):
        xl = a & LB_MASK
        xh = a >> HALF_NBITS
        xkb = xh * kl + xl * kh
        s = (xkb << HALF_NBITS) + xl * kl
        s = s & FB_MASK

        sl = s & LB_MASK
        sh = s >> HALF_NBITS
        sqb = sh * ql + sl * qh
        sqbl = sqb & LB_MASK
        sqbh = sqb >> HALF_NBITS
        carry = (a + sl * ql) >> HALF_NBITS
        carry = (carry + sqbl) >> HALF_NBITS
        return sqbh + carry + sh * qh


def mont_enter(a, Rs, ql, qh, kl, kh):
    """Multiply by a Montgomery-form scalar per channel: montmul(a, Rs)."""
    return mont_mult(a, Rs, ql, qh, kl, kh)


def mont_add(a, b, _2q):
    with np.errstate(**_ERR):
        a = np.asarray(a, dtype=_I64)
        b = np.asarray(b, dtype=_I64)
        _2q = np.asarray(_2q, dtype=_I64)
        s = a + b
        return np.where(s < _2q, s, s - _2q)


def mont_sub(a, b, _2q):
    with np.errstate(**_ERR):
        a = np.asarray(a, dtype=_I64)
        b = np.asarray(b, dtype=_I64)
        _2q = np.asarray(_2q, dtype=_I64)
        s = a + _2q - b
        return np.where(s < _2q, s, s - _2q)


def reduce_2q(a, _2q):
    """[0, 2q) -> [0, q)."""
    a = np.asarray(a, dtype=_I64)
    q = np.asarray(_2q, dtype=_I64) >> 1
    return np.where(a < q, a, a - q)


def make_signed(a, _2q):
    """[0, q) -> centered representative in (-q/2, q/2]."""
    a = np.asarray(a, dtype=_I64)
    q = np.asarray(_2q, dtype=_I64) >> 1
    q_half = q >> 1
    return np.where(a <= q_half, a, a - q)


def make_unsigned(a, _2q):
    a = np.asarray(a, dtype=_I64)
    q = np.asarray(_2q, dtype=_I64) >> 1
    return a + q


def tile_unsigned(a, _2q):
    """Broadcast a signed 1xN poly to CxN unsigned: a + q per channel."""
    a = np.asarray(a, dtype=_I64).reshape(1, -1)
    q = (np.asarray(_2q, dtype=_I64) >> 1).reshape(-1, 1)
    return a + q


# ---------------------------------------------------------------------------
# NTT / INTT: Longa-Naehrig negacyclic transforms as per-stage reshapes.
# ---------------------------------------------------------------------------


def ntt(a, psi, _2q, ql, qh, kl, kh):
    """Forward negacyclic NTT, in place semantics (returns new array).

    a: [C, N] lazy residues. psi: [C, N] bit-reverse-ordered psi powers in
    Montgomery form (multiplied by R). Stage with m blocks uses psi[:, m:2m].

    Cooley-Tukey butterflies; natural-order input, bit-reversed output —
    the same dataflow the reference paints into index tables
    (reference: ckks_context.py:89-112, ntt_cuda_kernel.cu:237-275).
    """
    a = np.array(a, dtype=_I64, copy=True)
    C, N = a.shape
    logN = N.bit_length() - 1
    _2qc = np.asarray(_2q, dtype=_I64).reshape(C, 1, 1)
    for logm in range(logN):
        m = 1 << logm
        t = N >> (logm + 1)
        v = a.reshape(C, m, 2, t)
        U = v[:, :, 0, :]
        O = v[:, :, 1, :]
        S = np.asarray(psi, dtype=_I64)[:, m: 2 * m, None]
        V = mont_mult(
            S, O,
            np.asarray(ql, dtype=_I64).reshape(C, 1, 1),
            np.asarray(qh, dtype=_I64).reshape(C, 1, 1),
            np.asarray(kl, dtype=_I64).reshape(C, 1, 1),
            np.asarray(kh, dtype=_I64).reshape(C, 1, 1),
        )
        with np.errstate(**_ERR):
            upv = U + V
            umv = U + _2qc - V
        v[:, :, 0, :] = np.where(upv < _2qc, upv, upv - _2qc)
        v[:, :, 1, :] = np.where(umv < _2qc, umv, umv - _2qc)
    return a


def intt(a, ipsi, Ninv, _2q, ql, qh, kl, kh):
    """Inverse negacyclic NTT (Gentleman-Sande), then multiply by N^{-1}.

    ipsi: [C, N] bit-reverse-ordered inverse-psi powers in Montgomery form.
    Ninv: per-channel N^{-1} * R mod q. Stage with h blocks uses ipsi[:, h:2h]
    (reference: ntt_cuda_kernel.cu:434-530).
    """
    a = np.array(a, dtype=_I64, copy=True)
    C, N = a.shape
    logN = N.bit_length() - 1
    _2qc = np.asarray(_2q, dtype=_I64).reshape(C, 1, 1)
    qlc = np.asarray(ql, dtype=_I64).reshape(C, 1, 1)
    qhc = np.asarray(qh, dtype=_I64).reshape(C, 1, 1)
    klc = np.asarray(kl, dtype=_I64).reshape(C, 1, 1)
    khc = np.asarray(kh, dtype=_I64).reshape(C, 1, 1)
    for logm in range(logN, 0, -1):
        h = 1 << (logm - 1)
        t = N >> logm
        v = a.reshape(C, h, 2, t)
        U = v[:, :, 0, :].copy()
        V = v[:, :, 1, :]
        S = np.asarray(ipsi, dtype=_I64)[:, h: 2 * h, None]
        with np.errstate(**_ERR):
            umv = U + _2qc - V
        O = np.where(umv < _2qc, umv, umv - _2qc)
        W = mont_mult(S, O, qlc, qhc, klc, khc)
        with np.errstate(**_ERR):
            upv = U + V
        v[:, :, 0, :] = np.where(upv < _2qc, upv, upv - _2qc)
        v[:, :, 1, :] = W
    # Normalize by N^{-1} (kept in Montgomery form, so domain is preserved).
    return mont_mult(
        a,
        np.asarray(Ninv, dtype=_I64).reshape(C, 1),
        np.asarray(ql, dtype=_I64).reshape(C, 1),
        np.asarray(qh, dtype=_I64).reshape(C, 1),
        np.asarray(kl, dtype=_I64).reshape(C, 1),
        np.asarray(kh, dtype=_I64).reshape(C, 1),
    )
