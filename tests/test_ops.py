"""Bit-exactness of the JAX uint32-limb ops against the golden model."""

import numpy as np
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import golden, ops, u64
from liberate_tpu.ntt.ntt_context import NttContext

LOGN = 7
N = 2 ** LOGN


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(
        logN=LOGN, num_scales=3, num_special_primes=2, scale_bits=40,
        is_secured=False, read_cache=False, save_cache=False,
    )


@pytest.fixture(scope="module")
def ntt_ctx(ctx):
    return NttContext(ctx)


@pytest.fixture(scope="module")
def gold(ctx):
    ql = np.array(ctx.q_lower_bits, dtype=np.int64)[:, None]
    qh = np.array(ctx.q_higher_bits, dtype=np.int64)[:, None]
    kl = np.array(ctx.k_lower_bits, dtype=np.int64)[:, None]
    kh = np.array(ctx.k_higher_bits, dtype=np.int64)[:, None]
    q2 = np.array(ctx.q_double, dtype=np.int64)[:, None]
    Rs = np.array(ctx.R_square, dtype=np.int64)[:, None]
    psi = golden.mont_mult(np.array(ctx.psi, dtype=np.int64), Rs, ql, qh, kl, kh)
    ipsi = golden.mont_mult(np.array(ctx.psi_inv, dtype=np.int64), Rs, ql, qh, kl, kh)
    Ninv = np.array([(n * ctx.R) % q for n, q in zip(ctx.N_inv, ctx.q)],
                    dtype=np.int64)[:, None]
    return dict(ql=ql, qh=qh, kl=kl, kh=kh, q2=q2, Rs=Rs,
                psi=psi, ipsi=ipsi, Ninv=Ninv)


def rand_lazy(ctx, rng, n=N, lazy=True):
    hi = [2 * qi if lazy else qi for qi in ctx.q]
    return np.stack([rng.integers(0, h, n) for h in hi]).astype(np.int64)


def dev(a):
    import jax.numpy as jnp
    return jnp.asarray(u64.from_int64_np(a))


def host(x):
    return u64.to_int64_np(np.asarray(x))


def test_mont_mult_bitexact(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    a = rand_lazy(ctx, rng)
    b = rand_lazy(ctx, rng)
    got = host(ops.mont_mult(dev(a), dev(b), pack))
    want = golden.mont_mult(a, b, gold["ql"], gold["qh"], gold["kl"], gold["kh"])
    assert np.array_equal(got, want)


def test_mont_mult_signed_bitexact(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    # Arbitrary two's-complement int64 first operand.
    a = rng.integers(-(2 ** 62), 2 ** 62, (len(ctx.q), N)).astype(np.int64)
    b = rand_lazy(ctx, rng, lazy=False)
    got = host(ops.mont_mult_signed(dev(a), dev(b), pack))
    want = golden.mont_mult(a, b, gold["ql"], gold["qh"], gold["kl"], gold["kh"])
    assert np.array_equal(got, want)


def test_redc_enter_bitexact(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    a = rand_lazy(ctx, rng)
    got = host(ops.mont_redc(dev(a), pack))
    want = golden.mont_redc(a, gold["ql"], gold["qh"], gold["kl"], gold["kh"])
    assert np.array_equal(got, want)

    got = host(ops.mont_enter(dev(a), pack))
    want = golden.mont_enter(a, gold["Rs"], gold["ql"], gold["qh"],
                             gold["kl"], gold["kh"])
    assert np.array_equal(got, want)


def test_add_sub_reduce_bitexact(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    a = rand_lazy(ctx, rng)
    b = rand_lazy(ctx, rng)
    assert np.array_equal(host(ops.mont_add(dev(a), dev(b), pack)),
                          golden.mont_add(a, b, gold["q2"]))
    assert np.array_equal(host(ops.mont_sub(dev(a), dev(b), pack)),
                          golden.mont_sub(a, b, gold["q2"]))
    assert np.array_equal(host(ops.reduce_2q(dev(a), pack)),
                          golden.reduce_2q(a, gold["q2"]))
    c = golden.reduce_2q(a, gold["q2"])
    assert np.array_equal(host(ops.make_signed(dev(c), pack)),
                          golden.make_signed(c, gold["q2"]))
    s = golden.make_signed(c, gold["q2"])
    assert np.array_equal(host(ops.make_unsigned(dev(s), pack)),
                          golden.make_unsigned(s, gold["q2"]))


def test_tile_unsigned(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    a = rng.integers(-2, 2, N).astype(np.int64)
    got = host(ops.tile_unsigned(dev(a), pack))
    want = golden.tile_unsigned(a, gold["q2"].ravel())
    assert np.array_equal(got, want)


def test_ntt_intt_bitexact(ctx, ntt_ctx, gold, rng):
    pack = ntt_ctx.level_pack(0, -2)
    a = rand_lazy(ctx, rng)
    got = host(ops.ntt(dev(a), pack))
    want = golden.ntt(a, gold["psi"], gold["q2"], gold["ql"], gold["qh"],
                      gold["kl"], gold["kh"])
    assert np.array_equal(got, want)

    got = host(ops.intt(dev(want), pack))
    want2 = golden.intt(want, gold["ipsi"], gold["Ninv"], gold["q2"],
                        gold["ql"], gold["qh"], gold["kl"], gold["kh"])
    assert np.array_equal(got, want2)


def test_level_pack_slicing(ctx, ntt_ctx, gold, rng):
    """Per-level packs act on the prime suffix q[l:]."""
    level = 2
    pack = ntt_ctx.level_pack(level, -1)
    C = ntt_ctx.num_channels(level, -1)
    assert C == ctx.num_scales + 1 - level
    a = rand_lazy(ctx, rng)[level:level + C]
    got = host(ops.ntt(dev(a), pack))
    want = golden.ntt(
        a, gold["psi"][level:level + C], gold["q2"][level:level + C],
        gold["ql"][level:level + C], gold["qh"][level:level + C],
        gold["kl"][level:level + C], gold["kh"][level:level + C])
    assert np.array_equal(got, want)


def test_jit_pipeline(ctx, ntt_ctx, gold, rng):
    """enter->ntt->pointwise->intt_exit_reduce jits and matches golden."""
    import jax

    pack = ntt_ctx.level_pack(0, -2)

    @jax.jit
    def pipeline(a, b, pk):
        am = ops.enter_ntt(a, pk)
        bm = ops.enter_ntt(b, pk)
        cm = ops.mont_mult(am, bm, pk)
        return ops.intt_exit_reduce(cm, pk)

    a = rand_lazy(ctx, rng, lazy=False)
    b = rand_lazy(ctx, rng, lazy=False)
    got = host(pipeline(dev(a), dev(b), pack))

    g = gold
    am = golden.ntt(golden.mont_enter(a, g["Rs"], g["ql"], g["qh"], g["kl"], g["kh"]),
                    g["psi"], g["q2"], g["ql"], g["qh"], g["kl"], g["kh"])
    bm = golden.ntt(golden.mont_enter(b, g["Rs"], g["ql"], g["qh"], g["kl"], g["kh"]),
                    g["psi"], g["q2"], g["ql"], g["qh"], g["kl"], g["kh"])
    cm = golden.mont_mult(am, bm, g["ql"], g["qh"], g["kl"], g["kh"])
    want = golden.reduce_2q(
        golden.mont_redc(
            golden.intt(cm, g["ipsi"], g["Ninv"], g["q2"], g["ql"], g["qh"],
                        g["kl"], g["kh"]),
            g["ql"], g["qh"], g["kl"], g["kh"]),
        g["q2"])
    assert np.array_equal(got, want)
