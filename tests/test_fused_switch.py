"""Fused key-switch kernel (ntt_ksk_accum) vs the composed-ops oracle.

The kernel fuses ident-canon + forward NTT + both ksk multiplies + the
part-axis accumulation (engine _switcher_fn fused branch) — bit-exact by
construction (identical per-element op order); verified here in interpret
mode, both at the kernel level and through the engine end-to-end.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import liberate_tpu
from liberate_tpu import config
from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import ops, pallas_ntt, u64
from liberate_tpu.ntt.ntt_context import NttContext


@pytest.fixture()
def pallas_interpret():
    config.use_pallas = True
    _shoup_prev = config.use_shoup_twiddles
    config.use_shoup_twiddles = False  # bit-exact parity mode
    config.pallas_interpret = True
    config.use_fused_switch = True
    try:
        yield
    finally:
        config.use_pallas = None
        config.use_shoup_twiddles = _shoup_prev
        config.pallas_interpret = False
        config.use_fused_switch = False


def test_kernel_matches_composed_ops(pallas_interpret):
    logN, level, P = 9, 1, 3
    ctx = CkksContext(logN=logN, scale_bits=30, num_scales=5,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    pack_sp = nc.level_pack(level, -2)
    plan = pack_sp.pallas
    assert plan is not None and pallas_ntt.supports_fused_accum(plan)

    C = nc.num_channels(level, -2)
    C0 = nc.total_channels
    N = ctx.N
    rng = np.random.default_rng(3)

    # Signed ext inputs (wrapped-negative allowed), full-width stacked ksk.
    ext_i = rng.integers(-2 ** 61, 2 ** 61, size=(P, C, N), dtype=np.int64)
    ext = jnp.asarray(u64.from_int64_np(ext_i))
    qs = np.array(ctx.q, dtype=np.uint64)
    k0_i = (rng.integers(0, 2 ** 62, size=(P, C0, N), dtype=np.uint64)
            % qs[None, :, None]).astype(np.int64)
    k1_i = (rng.integers(0, 2 ** 62, size=(P, C0, N), dtype=np.uint64)
            % qs[None, :, None]).astype(np.int64)
    k0 = jnp.asarray(u64.from_int64_np(k0_i))
    k1 = jnp.asarray(u64.from_int64_np(k1_i))

    ident = jnp.asarray(np.stack([
        np.array([(ctx.R % qi) & 0xFFFFFFFF for qi in ctx.q[level:]],
                 dtype=np.uint32),
        np.array([(ctx.R % qi) >> 32 for qi in ctx.q[level:]],
                 dtype=np.uint32)]))

    # Oracle: composed XLA ops (plan stripped).
    pack_x = pack_sp._replace(pallas=None)
    e = ops.canon_2q(
        ops.mont_enter_scalar(ext, ident, pack_x, signed=True), pack_x)
    e = ops.ntt(e, pack_x)
    k0_lvl = k0[:, :, level:, :]
    k1_lvl = k1[:, :, level:, :]
    t0 = ops.mont_mult(e, k0_lvl, pack_x)
    t1 = ops.mont_mult(e, k1_lvl, pack_x)
    want0, want1 = t0[:, 0], t1[:, 0]
    for p in range(1, P):
        want0 = ops.mont_add(want0, t0[:, p], pack_x)
        want1 = ops.mont_add(want1, t1[:, p], pack_x)

    got0, got1 = pallas_ntt.ntt_ksk_accum(ext, k0, k1, plan, ident,
                                          level, 0, interpret=True)
    assert np.array_equal(np.asarray(got0), np.asarray(want0))
    assert np.array_equal(np.asarray(got1), np.asarray(want1))


def test_engine_mult_with_fused_switch(pallas_interpret):
    """End-to-end mult through the engine with the fused kernel active
    (interpret mode); result must decrypt correctly."""
    eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                  num_special_primes=2, is_secured=False,
                                  seed=17)
    assert eng.pack(1, -2).pallas is not None
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)
    out = eng.mult(ct1, ct2, evk)
    dec = eng.decrode(out, sk)
    assert abs(eng.absmax_error(dec, m1 * m2)) < 1e-4


def test_engine_chained_mult_and_rotate_with_fused_switch(pallas_interpret):
    """The fused kernel is DEFAULT-ON on TPU: chain mults through several
    levels (partial gadget parts, shrinking channel counts) and a rotation,
    all through the fused switcher (interpret mode)."""
    eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=5,
                                  num_special_primes=2, is_secured=False,
                                  seed=23)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    want = m.copy()
    for _ in range(3):                     # levels 0 -> 3
        ct = eng.mult(ct, ct, evk)
        want = want * want
    assert abs(eng.absmax_error(eng.decrode(ct, sk), want)) < 1e-3
    rotk = eng.create_rotation_key(sk, 2)
    rot = eng.rotate_single(ct, rotk)
    assert abs(eng.absmax_error(eng.decrode(rot, sk),
                                np.roll(want, 2))) < 1e-3
