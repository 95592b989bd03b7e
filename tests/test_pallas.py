"""Pallas NTT kernels vs the XLA (ops.py) path — bit-exact equality.

Runs in interpret mode on CPU; the same kernels compile for real TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import ops, u64
from liberate_tpu.ntt.ntt_context import NttContext
from liberate_tpu.ntt import pallas_ntt


@pytest.fixture(scope="module")
def setup():
    from liberate_tpu import config

    ctx = CkksContext(logN=8, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    pack = nc.level_pack(0, -2)  # built with Pallas off -> XLA oracle path
    start, stop = nc.channel_range(0, -2)
    config.use_pallas = True
    _shoup_prev = config.use_shoup_twiddles
    config.use_shoup_twiddles = False  # bit-exact parity mode
    try:
        plan = nc._maybe_pallas_plan(np.arange(start, stop))
    finally:
        config.use_pallas = None
        config.use_shoup_twiddles = _shoup_prev
    C = nc.num_channels(0, -2)
    rng = np.random.default_rng(7)
    qs = np.array(ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, ctx.N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))
    return ctx, nc, pack, plan, a


def _eq(x, y):
    return np.array_equal(np.asarray(x), np.asarray(y))


def test_ntt_forward_bit_exact(setup):
    _, _, pack, plan, a = setup
    want = ops.ntt(a, pack)
    got = pallas_ntt.ntt(a, plan, interpret=True)
    assert _eq(got, want)


def test_ntt_forward_signed_bit_exact(setup):
    ctx, _, pack, plan, a = setup
    # Wrapped-negative inputs (as produced by basis extension).
    neg = u64.pack(*u64.sub((jnp.zeros_like(a[0]), jnp.zeros_like(a[1])),
                            (a[0], a[1])))
    want = ops.ntt(neg, pack, signed=True)
    got = pallas_ntt.ntt(neg, plan, signed=True, interpret=True)
    assert _eq(got, want)


def test_enter_ntt_bit_exact(setup):
    _, _, pack, plan, a = setup
    want = ops.enter_ntt(a, pack)
    got = pallas_ntt.ntt(a, plan, pre_enter=True, interpret=True)
    assert _eq(got, want)


def test_intt_bit_exact(setup):
    _, _, pack, plan, a = setup
    want = ops.intt(a, pack)
    got = pallas_ntt.intt(a, plan, interpret=True)
    assert _eq(got, want)


def test_intt_exit_reduce_bit_exact(setup):
    _, _, pack, plan, a = setup
    want = ops.intt_exit_reduce(a, pack)
    got = pallas_ntt.intt(a, plan, post_exit=True, post_reduce=True,
                          interpret=True)
    assert _eq(got, want)


def test_intt_signed_bit_exact(setup):
    _, _, pack, plan, a = setup
    neg = u64.pack(*u64.sub((jnp.zeros_like(a[0]), jnp.zeros_like(a[1])),
                            (a[0], a[1])))
    want = ops.intt_exit_reduce(neg, pack, signed=True)
    got = pallas_ntt.intt(neg, plan, signed=True, post_exit=True,
                          post_reduce=True, interpret=True)
    assert _eq(got, want)


def test_roundtrip(setup):
    _, _, pack, plan, a = setup
    f = pallas_ntt.ntt(a, plan, interpret=True)
    b = pallas_ntt.intt(f, plan, interpret=True)
    # intt(ntt(x)) == x up to the lazy representative: reduce both.
    assert _eq(ops.reduce_2q(b, pack), ops.reduce_2q(a, pack))


def test_batched_matches_unbatched(setup):
    _, _, pack, plan, a = setup
    batch = jnp.stack([a, ops.mont_add(a, a, pack)], axis=1)  # [2, B, C, N]
    got = pallas_ntt.ntt(batch, plan, interpret=True)
    want0 = pallas_ntt.ntt(a, plan, interpret=True)
    want1 = pallas_ntt.ntt(ops.mont_add(a, a, pack), plan, interpret=True)
    assert _eq(got[:, 0], want0)
    assert _eq(got[:, 1], want1)
