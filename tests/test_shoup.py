"""Shoup constant-multiply twiddle path (config.use_shoup_twiddles).

The Shoup path computes the same values mod q as the Montgomery chain
with different [0, 2q) lazy representatives, so these tests check
mod-q equality against the XLA oracle (plus an exact unit test of the
shoup_mul primitive against the integer formula).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import ops, u64
from liberate_tpu.ntt.ntt_context import NttContext
from liberate_tpu.ntt import pallas_ntt


def test_shoup_mul_exact(rng):
    """u64.shoup_mul == the integer formula, and < 2q, for random x."""
    q = (1 << 61) - 121  # any odd modulus < 2^62
    w = int(rng.integers(1, q))
    wp = (w << 64) // q
    x = rng.integers(0, 1 << 63, size=256, dtype=np.uint64)
    xs = (jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
          jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))

    def pair(v):
        return (jnp.uint32(v & 0xFFFFFFFF), jnp.uint32(v >> 32))

    lo, hi = u64.shoup_mul(xs, pair(w), pair(wp), pair(q))
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(lo).astype(np.uint64)
    want = np.array([(w * int(v) - (((wp * int(v)) >> 64) * q))
                     & 0xFFFFFFFFFFFFFFFF for v in x], dtype=np.uint64)
    assert np.array_equal(got, want)
    assert int(got.max()) < 2 * q
    assert np.array_equal(got % np.uint64(q),
                          np.array([w * int(v) % q for v in x],
                                   dtype=np.uint64))


@pytest.fixture(scope="module")
def setup():
    from liberate_tpu import config

    ctx = CkksContext(logN=8, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    pack = nc.level_pack(0, -2)
    start, stop = nc.channel_range(0, -2)
    config.use_pallas = True
    prev = config.use_shoup_twiddles
    config.use_shoup_twiddles = True
    try:
        plan = nc._maybe_pallas_plan(np.arange(start, stop))
    finally:
        config.use_pallas = None
        config.use_shoup_twiddles = prev
    assert plan.row_tw.shape[0] == 4, "expected Shoup planes"
    C = nc.num_channels(0, -2)
    rng = np.random.default_rng(7)
    qs = np.array(ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, ctx.N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))
    return ctx, pack, plan, a, qs[:C]


def _mod_q(packed, qs):
    v = u64.to_int64_np(np.asarray(packed)).view(np.uint64)
    return v % qs[:, None]


def test_shoup_ntt_mod_q(setup):
    _, pack, plan, a, qs = setup
    want = _mod_q(ops.ntt(a, pack), qs)
    got = np.asarray(pallas_ntt.ntt(a, plan, interpret=True))
    assert int(u64.to_int64_np(got).view(np.uint64).max()) \
        < 2 * int(qs.max())
    assert np.array_equal(_mod_q(got, qs), want)


def test_shoup_enter_ntt_mod_q(setup):
    _, pack, plan, a, qs = setup
    want = _mod_q(ops.enter_ntt(a, pack), qs)
    got = _mod_q(pallas_ntt.ntt(a, plan, pre_enter=True, interpret=True), qs)
    assert np.array_equal(got, want)


def test_shoup_intt_exit_reduce_mod_q(setup):
    _, pack, plan, a, qs = setup
    want = _mod_q(ops.intt_exit_reduce(a, pack), qs)
    got = _mod_q(pallas_ntt.intt(a, plan, post_exit=True, post_reduce=True,
                                 interpret=True), qs)
    assert np.array_equal(got, want)


def test_shoup_roundtrip(setup):
    _, pack, plan, a, qs = setup
    f = pallas_ntt.ntt(a, plan, interpret=True)
    b = pallas_ntt.intt(f, plan, interpret=True)
    assert np.array_equal(_mod_q(b, qs), _mod_q(a, qs))


def test_shoup_rejects_signed(setup):
    _, _, plan, a, _ = setup
    with pytest.raises(ValueError):
        pallas_ntt.ntt(a, plan, signed=True, interpret=True)
    with pytest.raises(ValueError):
        pallas_ntt.intt(a, plan, signed=True, interpret=True)
