"""Tiled XLA mod-down (config.use_tiled_moddown) vs the flat composed
chain: bit-exact.

The tiled variant mirrors the engine's mod_down loop element-op for
element-op (engine _switcher_fn; reference: ckks_engine.py:846-901), so
outputs must be IDENTICAL representatives, not just congruent.
(The fused Pallas mod-down kernel this file once covered was removed in
round 5: superseded by the Shoup plain-domain mod-down.)
"""


import numpy as np
import jax
import jax.numpy as jnp
import pytest

import liberate_tpu
from liberate_tpu import config
from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import ops, u64
from liberate_tpu.ntt.ntt_context import NttContext


def _composed_mod_down(d, pack_sp, pack_ord, PiRs, enter_ord, n_sp, C_sp,
                       W_sp, W_ord):
    d = ops.mont_enter_scalar(d, enter_ord, pack_sp, signed=True)
    for P_ind in range(n_sp):
        cur = C_sp - P_ind
        tile = jnp.broadcast_to(d[:, cur - 1:cur], (2, W_sp, d.shape[2]))
        tile = ops.mont_enter_scalar(tile, enter_ord, pack_sp, signed=True)
        d = ops.mont_sub(d, tile, pack_sp)
        d = ops.mont_enter_scalar(d, PiRs[P_ind], pack_sp, signed=True)
        d = ops.reduce_2q(d, pack_sp)
    d = ops.mont_redc_signed(d[:, :W_ord], pack_ord)
    return ops.reduce_2q(d, pack_ord)


def test_tiled_matches_composed():
    """The 4-D tiled XLA mod-down (config.use_tiled_moddown) is bit-exact
    with the flat composed chain — pure XLA, no Pallas needed."""
    from liberate_tpu.fhe import engine as engine_mod

    logN, level = 9, 1
    eng = liberate_tpu.CkksEngine(logN=logN, scale_bits=30, num_scales=5,
                                  num_special_primes=2, is_secured=False,
                                  seed=13)
    nc = eng.ntt
    pack_sp = nc.level_pack(level, -2)
    pack_ord = nc.level_pack(level, -1)
    n_sp = eng.num_special
    C_sp = nc.num_channels(level, -2)
    W_sp = nc.padded_channels(level, -2)
    W_ord = nc.padded_channels(level, -1)
    PiRs = tuple(eng.PiRs[level])
    enter_ord = eng.enter_ord[level]

    rng = np.random.default_rng(77)
    qs = np.array(nc.q_ints(level, -2), dtype=np.uint64)
    d_int = (rng.integers(0, 1 << 62, size=(C_sp, 1 << logN),
                          dtype=np.uint64) % (2 * qs[:, None]))
    d = jnp.asarray(u64.from_int64_np(d_int.astype(np.int64)))

    want = _composed_mod_down(d, pack_sp, pack_ord, PiRs, enter_ord,
                              n_sp, C_sp, W_sp, W_ord)
    got = engine_mod._mod_down_tiled(d, pack_sp, pack_ord, PiRs, enter_ord,
                                     n_sp, C_sp, W_sp, W_ord)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_engine_end_to_end_with_tiled_moddown():
    config.use_tiled_moddown = True
    try:
        eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                      num_special_primes=2,
                                      is_secured=False, seed=7)
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m1 = eng.example(amin=-1, amax=1)
        m2 = eng.example(amin=-1, amax=1)
        ct = eng.mult(eng.encorypt(m1, pk), eng.encorypt(m2, pk), evk)
        err = abs(eng.absmax_error(eng.decrode(ct, sk), m1 * m2))
        assert err < 1e-5
    finally:
        config.use_tiled_moddown = False
