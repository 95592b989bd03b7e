"""Golden-model correctness: Montgomery identities and NTT roundtrips.

The golden model is the oracle for all device kernels, so it must itself be
proven against plain integer arithmetic.
"""

import numpy as np
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import golden

LOGN = 7  # tiny ring for fast tests


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(
        logN=LOGN, num_scales=3, num_special_primes=2, scale_bits=40,
        is_secured=False, read_cache=False, save_cache=False,
    )


def consts(ctx):
    ql = np.array(ctx.q_lower_bits, dtype=np.int64)[:, None]
    qh = np.array(ctx.q_higher_bits, dtype=np.int64)[:, None]
    kl = np.array(ctx.k_lower_bits, dtype=np.int64)[:, None]
    kh = np.array(ctx.k_higher_bits, dtype=np.int64)[:, None]
    q2 = np.array(ctx.q_double, dtype=np.int64)[:, None]
    return ql, qh, kl, kh, q2


def test_context_primes(ctx):
    N = 2 ** LOGN
    for qi in ctx.q:
        assert (qi - 1) % (2 * N) == 0
        assert 4 * qi < ctx.R
    # Pack layout: scales ascending positions, then base, then specials.
    assert len(ctx.q) == ctx.num_scales + 1 + ctx.num_special_primes
    base = ctx.q[ctx.num_scales]
    assert base > 2 ** 59  # message prime just below 2^60


def test_mont_mult_formula(ctx, rng):
    """mont_mult == a*b*R^{-1} mod q, with the exact (x+s*q)/R representative."""
    ql, qh, kl, kh, q2 = consts(ctx)
    C = len(ctx.q)
    n = 64
    a = np.stack([rng.integers(0, 2 * qi, n) for qi in ctx.q]).astype(np.int64)
    b = np.stack([rng.integers(0, 2 * qi, n) for qi in ctx.q]).astype(np.int64)
    got = golden.mont_mult(a, b, ql, qh, kl, kh)
    R = ctx.R
    for c, qi in enumerate(ctx.q):
        k = ctx.k[c]
        for j in range(n):
            x = int(a[c, j]) * int(b[c, j])
            s = (x % R) * k % R
            u = (x + s * qi) // R
            assert int(got[c, j]) == u
            assert 0 <= u < 2 * qi
            assert u % qi == x * pow(R, -1, qi) % qi


def test_mont_mult_signed_inputs(ctx, rng):
    """Negative (two's complement) first operands behave like the CUDA core:
    result is congruent to a*b*R^{-1} mod q."""
    ql, qh, kl, kh, q2 = consts(ctx)
    n = 32
    a = np.stack([rng.integers(-2 * qi, 2 * qi, n) for qi in ctx.q]).astype(np.int64)
    b = np.stack([rng.integers(0, qi, n) for qi in ctx.q]).astype(np.int64)
    got = golden.mont_mult(a, b, ql, qh, kl, kh)
    R = ctx.R
    for c, qi in enumerate(ctx.q):
        Rinv = pow(R, -1, qi)
        want = (a[c].astype(object) * b[c].astype(object) * Rinv) % qi
        assert np.all(got[c].astype(object) % qi == want)


def test_mont_redc(ctx, rng):
    ql, qh, kl, kh, q2 = consts(ctx)
    n = 64
    a = np.stack([rng.integers(0, 2 * qi, n) for qi in ctx.q]).astype(np.int64)
    got = golden.mont_redc(a, ql, qh, kl, kh)
    R = ctx.R
    for c, qi in enumerate(ctx.q):
        Rinv = pow(R, -1, qi)
        want = (a[c].astype(object) * Rinv) % qi
        assert np.all(got[c].astype(object) % qi == want)


def test_enter_redc_roundtrip(ctx, rng):
    ql, qh, kl, kh, q2 = consts(ctx)
    Rs = np.array(ctx.R_square, dtype=np.int64)[:, None]
    n = 64
    a = np.stack([rng.integers(0, qi, n) for qi in ctx.q]).astype(np.int64)
    m = golden.mont_enter(a, Rs, ql, qh, kl, kh)
    back = golden.reduce_2q(golden.mont_redc(m, ql, qh, kl, kh), q2)
    assert np.array_equal(back, a)


def _ntt_tables(ctx):
    ql, qh, kl, kh, q2 = consts(ctx)
    Rs = np.array(ctx.R_square, dtype=np.int64)[:, None]
    psi = golden.mont_mult(np.array(ctx.psi, dtype=np.int64), Rs, ql, qh, kl, kh)
    ipsi = golden.mont_mult(np.array(ctx.psi_inv, dtype=np.int64), Rs, ql, qh, kl, kh)
    Ninv = np.array(
        [(ninv * ctx.R) % q for ninv, q in zip(ctx.N_inv, ctx.q)],
        dtype=np.int64,
    )[:, None]
    return psi, ipsi, Ninv, ql, qh, kl, kh, q2


def test_ntt_intt_roundtrip(ctx, rng):
    N = 2 ** LOGN
    psi, ipsi, Ninv, ql, qh, kl, kh, q2 = _ntt_tables(ctx)
    a = np.stack([rng.integers(0, qi, N) for qi in ctx.q]).astype(np.int64)
    f = golden.ntt(a, psi, q2, ql, qh, kl, kh)
    b = golden.intt(f, ipsi, Ninv, q2, ql, qh, kl, kh)
    b = golden.reduce_2q(b, q2)
    assert np.array_equal(a, b)


def test_ntt_negacyclic_convolution(ctx, rng):
    """NTT-domain pointwise mont_mult == negacyclic polynomial product."""
    N = 2 ** LOGN
    psi, ipsi, Ninv, ql, qh, kl, kh, q2 = _ntt_tables(ctx)
    C = len(ctx.q)
    a = np.stack([rng.integers(0, qi, N) for qi in ctx.q]).astype(np.int64)
    b = np.stack([rng.integers(0, qi, N) for qi in ctx.q]).astype(np.int64)

    # Device-style: enter Montgomery, NTT, pointwise, INTT, exit.
    Rs = np.array(ctx.R_square, dtype=np.int64)[:, None]
    am = golden.ntt(golden.mont_enter(a, Rs, ql, qh, kl, kh), psi, q2, ql, qh, kl, kh)
    bm = golden.ntt(golden.mont_enter(b, Rs, ql, qh, kl, kh), psi, q2, ql, qh, kl, kh)
    cm = golden.mont_mult(am, bm, ql, qh, kl, kh)
    c = golden.intt(cm, ipsi, Ninv, q2, ql, qh, kl, kh)
    c = golden.reduce_2q(golden.mont_redc(c, ql, qh, kl, kh), q2)

    # Naive negacyclic product per channel.
    for ci, qi in enumerate(ctx.q):
        ref = np.zeros(N, dtype=object)
        av = a[ci].astype(object)
        bv = b[ci].astype(object)
        for i in range(N):
            for j in range(N):
                k = i + j
                sign = 1
                if k >= N:
                    k -= N
                    sign = -1
                ref[k] = (ref[k] + sign * av[i] * bv[j]) % qi
        assert np.all(c[ci].astype(object) == ref % qi)
