"""Coefficient-axis sharded NTT prototype: bit-exact vs the single-chip path.

VERDICT round-1 item #10 / SURVEY 7: sharding the COEFFICIENT axis (not
just RNS channels) is the dimension that lets one transform span chips.
Default CI shape is logN=10 on 4 and 8 shards (covers the cross-shard
stage exchange on both mesh sizes); the VERDICT target shape logN=13 is
kept under the slow marker (8-device GSPMD compiles at logN=13 take
minutes on the CPU backend).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext
from liberate_tpu.ntt import ops, u64
from liberate_tpu.ntt.ntt_context import NttContext
from liberate_tpu.parallel import make_mesh
from liberate_tpu.parallel.coef_shard import (
    intt_coef_sharded,
    make_coef_plan,
    ntt_coef_sharded,
)

_SETUPS = {}


def _setup(logN, S):
    if (logN, S) in _SETUPS:
        return _SETUPS[(logN, S)]
    ctx = CkksContext(logN=logN, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    mesh = make_mesh(S, axis_name="coef")
    plan = make_coef_plan(nc, mesh)
    pack = nc.level_pack(0, -2)
    C = nc.num_channels(0, -2)
    rng = np.random.default_rng(logN * 100 + S)
    qs = np.array(ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, ctx.N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))
    from jax.sharding import NamedSharding, PartitionSpec as P
    a_sharded = jax.device_put(a, NamedSharding(mesh, P(None, None, "coef")))
    _SETUPS[(logN, S)] = (pack, plan, a, a_sharded)
    return _SETUPS[(logN, S)]


def _eq(x, y):
    return np.array_equal(np.asarray(x), np.asarray(y))


# The 8-shard GSPMD CPU compiles cost minutes each; CI keeps the 4-shard
# shapes and gates the 8-shard + logN=13 ones behind the slow marker.
_SHAPES = [(10, 4)]
_SLOW_SHAPES = [(13, 8), (10, 8)]


@pytest.mark.parametrize("logN,S", _SHAPES)
def test_ntt_coef_sharded_bit_exact(logN, S):
    pack, plan, a, a_sharded = _setup(logN, S)
    want = ops.ntt(a, pack)
    got = ntt_coef_sharded(a_sharded, plan)
    assert _eq(got, want)


@pytest.mark.parametrize("logN,S", _SHAPES)
def test_intt_coef_sharded_bit_exact(logN, S):
    pack, plan, a, a_sharded = _setup(logN, S)
    f = ops.ntt(a, pack)
    want = ops.intt(f, pack)
    from jax.sharding import NamedSharding, PartitionSpec as P
    f_sharded = jax.device_put(
        f, NamedSharding(plan.mesh, P(None, None, "coef")))
    got = intt_coef_sharded(f_sharded, plan)
    assert _eq(got, want)


@pytest.mark.slow
def test_roundtrip_sharded():
    pack, plan, a, a_sharded = _setup(10, 8)
    f = ntt_coef_sharded(a_sharded, plan)
    b = intt_coef_sharded(f, plan)
    assert _eq(ops.reduce_2q(jnp.asarray(np.asarray(b)), pack),
               ops.reduce_2q(a, pack))


@pytest.mark.slow
@pytest.mark.parametrize("logN,S", _SLOW_SHAPES)
def test_coef_sharded_bit_exact_logN13(logN, S):
    pack, plan, a, a_sharded = _setup(logN, S)
    f_want = ops.ntt(a, pack)
    f = ntt_coef_sharded(a_sharded, plan)
    assert _eq(f, f_want)
    from jax.sharding import NamedSharding, PartitionSpec as P
    f_sharded = jax.device_put(
        f_want, NamedSharding(plan.mesh, P(None, None, "coef")))
    assert _eq(intt_coef_sharded(f_sharded, plan), ops.intt(f_want, pack))


def test_coef_sharded_batched_fused_chains():
    """Batched [2, P, C, N] part stacks through the sharded transforms,
    with the Montgomery entry/exit chains fused in (the op shapes of the
    key switcher) — bit-exact vs ops.enter_ntt / ops.intt_exit_reduce."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    pack, plan, a, _ = _setup(10, 4)
    ab = jnp.stack([a, ops.mont_add(a, a, pack)], axis=1)   # [2, P=2, C, N]
    sh = NamedSharding(plan.mesh, P(None, None, None, "coef"))
    ab_sh = jax.device_put(ab, sh)
    want_f = ops.enter_ntt(ab, pack)
    got_f = ntt_coef_sharded(ab_sh, plan, pre_enter=True)
    assert _eq(got_f, want_f)
    want_i = ops.intt_exit_reduce(want_f, pack)
    got_i = intt_coef_sharded(jax.device_put(want_f, sh), plan,
                              post_exit=True, post_reduce=True)
    assert _eq(got_i, want_i)


def _setup_2d(logN, n_rns, n_coef, pallas=False):
    from liberate_tpu.parallel import make_mesh2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    ctx = CkksContext(logN=logN, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    mesh = make_mesh2d(n_rns, n_coef)
    plan = make_coef_plan(nc, mesh, rns_axis="rns")
    if pallas:
        assert plan.pl_row_tw is not None
    pack = nc.level_pack(0, -2)
    C = nc.num_channels(0, -2)
    assert C % n_rns == 0, f"test shape needs C % n_rns == 0 (C={C})"
    rng = np.random.default_rng(logN * 1000 + n_rns * 10 + n_coef)
    qs = np.array(ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, ctx.N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))
    sh = NamedSharding(mesh, P(None, "rns", "coef"))
    return pack, plan, a, jax.device_put(a, sh), sh


def test_coef_sharded_2d_mesh_bit_exact():
    """2-D ('rns','coef') layout: channels AND coefficients sharded at
    once (SURVEY 7 design dimension). Bit-exact vs the single-chip path
    on a (2, 4) virtual mesh."""
    pack, plan, a, a_sh, sh = _setup_2d(10, 2, 4)
    f_want = ops.ntt(a, pack)
    assert _eq(ntt_coef_sharded(a_sh, plan), f_want)
    f_sh = jax.device_put(f_want, sh)
    assert _eq(intt_coef_sharded(f_sh, plan), ops.intt(f_want, pack))


def test_coef_sharded_2d_mesh_pallas_bit_exact():
    """2-D layout with the local stages on the fused Pallas kernels
    (interpret mode): logN=11 on (2 rns, 4 coef) -> logL=9 locals."""
    from liberate_tpu import config

    config.use_pallas = True
    config.pallas_interpret = True
    _shoup_prev = config.use_shoup_twiddles
    config.use_shoup_twiddles = False  # bit-exact parity: the oracle
    # pack's pallas plan and the coef locals must agree on the twiddle
    # multiply's [0, 2q) representatives (coef planes are Montgomery).
    try:
        pack, plan, a, a_sh, sh = _setup_2d(11, 2, 4, pallas=True)
        f_want = ops.ntt(a, pack)
        assert _eq(ntt_coef_sharded(a_sh, plan), f_want)
        f_sh = jax.device_put(f_want, sh)
        assert _eq(intt_coef_sharded(f_sh, plan), ops.intt(f_want, pack))
    finally:
        config.use_pallas = None
        config.pallas_interpret = False
        config.use_shoup_twiddles = _shoup_prev


@pytest.mark.slow
def test_engine_on_2d_mesh():
    """The WHOLE engine on a ('rns','coef') 2-D mesh: packs carry
    CoefShardPlans, every NTT dispatches into shard_map with cross-shard
    ppermute stages, pointwise ops partition under GSPMD. Slow: the
    sharded mult program compiles ~7 min on the 8-device CPU mesh."""
    import liberate_tpu
    from liberate_tpu.parallel import make_mesh2d

    mesh = make_mesh2d(2, 4)
    eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                  num_special_primes=2, is_secured=False,
                                  seed=7, mesh=mesh)
    assert eng.pack(0, -2).coef is not None
    assert eng.pack(0, -2).coef.rns_axis == "rns"
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    assert abs(eng.absmax_error(eng.decrode(ct, sk), m)) < 1e-6
    prod = eng.mult(ct, ct, evk)
    assert abs(eng.absmax_error(eng.decrode(prod, sk), m * m)) < 1e-5
    rotk = eng.create_rotation_key(sk, 1)
    rot = eng.rotate_single(ct, rotk)
    assert abs(eng.absmax_error(eng.decrode(rot, sk),
                                np.roll(m, 1))) < 1e-5


@pytest.mark.slow
def test_multiparty_on_2d_mesh():
    """3-party collective pk + threshold decryption on the 2-D mesh."""
    import liberate_tpu
    from liberate_tpu.parallel import make_mesh2d

    eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                  num_special_primes=2, is_secured=False,
                                  seed=9, mesh=make_mesh2d(2, 4))
    sks = [eng.create_secret_key() for _ in range(3)]
    pk0 = eng.multiparty_create_public_key(sks[0])
    crs = eng.multiparty_public_crs(pk0)
    pks = [pk0] + [eng.multiparty_create_public_key(s, a=crs)
                   for s in sks[1:]]
    cpk = eng.multiparty_create_collective_public_key(pks)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, cpk)
    pcts = [eng.multiparty_decrypt_head(ct, sks[0])]
    pcts += [eng.multiparty_decrypt_partial(ct, s) for s in sks[1:]]
    dec = eng.multiparty_decrypt_fusion(pcts, level=ct.level)
    assert abs(eng.absmax_error(dec, m)) < 1e-5


def test_coef_sharded_pallas_local_bit_exact():
    """Local stages through the fused Pallas kernels (interpret): same
    bits as the XLA local path and the single-chip oracle (logN=10 on 4
    shards -> logL=8, the smallest kernel-eligible local size)."""
    from liberate_tpu import config

    logN, S = 10, 4
    pack, _, a, _ = _setup(logN, S)
    config.use_pallas = True
    config.pallas_interpret = True
    _shoup_prev = config.use_shoup_twiddles
    config.use_shoup_twiddles = False  # bit-exact parity: the oracle
    # pack's pallas plan and the coef locals must agree on the twiddle
    # multiply's [0, 2q) representatives (coef planes are Montgomery).
    try:
        ctx = CkksContext(logN=logN, scale_bits=30, num_scales=3,
                          num_special_primes=2, is_secured=False)
        nc = NttContext(ctx)
        mesh = make_mesh(S, axis_name="coef")
        plan = make_coef_plan(nc, mesh)
        assert plan.pl_row_tw is not None
        from jax.sharding import NamedSharding, PartitionSpec as P
        a_sh = jax.device_put(a, NamedSharding(mesh, P(None, None, "coef")))
        assert _eq(ntt_coef_sharded(a_sh, plan), ops.ntt(a, pack))
        f = ops.ntt(a, pack)
        f_sh = jax.device_put(f, NamedSharding(mesh, P(None, None, "coef")))
        assert _eq(intt_coef_sharded(f_sh, plan), ops.intt(f, pack))
        # Batched [2, P, C, L-locals] through the SAME fused kernels (the
        # shape the key switcher's part stacks take on a 2-D mesh).
        ab = jnp.stack([a, ops.mont_add(a, a, pack)], axis=1)
        ab_sh = jax.device_put(
            ab, NamedSharding(mesh, P(None, None, None, "coef")))
        assert _eq(ntt_coef_sharded(ab_sh, plan, pre_enter=True),
                   ops.enter_ntt(ab, pack))
    finally:
        config.use_pallas = None
        config.pallas_interpret = False
        config.use_shoup_twiddles = _shoup_prev
