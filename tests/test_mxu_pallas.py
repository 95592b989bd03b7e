"""Fused Pallas MXU NTT kernels vs the XLA MXU composition.

mxu_pallas runs the identical digit/matmul/recombine chain as mxu_ntt
inside one VMEM-resident kernel per channel — bit-exact by construction
(same op order per element), pinned here in interpret mode, single and
batched, forward and inverse.

Note logN=8 gives S=16, R=16 — far below the 128-lane tile, so interpret
mode is the only CPU-viable check; real shapes (S, R >= 128) run on
hardware via benchmarks/ntt_probe8.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext, \
    primitive_root_2N
from liberate_tpu.ntt import mxu_ntt, mxu_pallas, u64
from liberate_tpu.ntt.ntt_context import NttContext

LOGN = 8


@pytest.fixture(scope="module")
def setup():
    ctx = CkksContext(logN=LOGN, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False)
    nc = NttContext(ctx)
    C = nc.num_channels(0, -2)
    q_list = nc.q_ints(0, -2)
    psis = [primitive_root_2N(q, ctx.N) for q in q_list]
    ipsis = [pow(p, -1, q) for p, q in zip(psis, q_list)]
    Rms = [pow(2, 62, q) for q in q_list]
    Ninvs = [pow(ctx.N, -1, q) for q in q_list]
    d = mxu_ntt.make_plan(LOGN, q_list, Rms, psis, ipsis, Ninvs)
    pack = nc.level_pack(0, -2)
    plan = mxu_ntt.plan_from_dict(d, pack.ql, pack.qh, pack.kl, pack.kh,
                                  pack.q2)
    rng = np.random.default_rng(9)
    qs = np.array(q_list, dtype=np.uint64)
    # lazy [0, 2q) inputs, like the engine's hot path
    a_int = (rng.integers(0, 1 << 62, size=(C, ctx.N), dtype=np.uint64)
             % (2 * qs[:, None])).astype(np.int64)
    return plan, q_list, jnp.asarray(u64.from_int64_np(a_int))


def _canon(packed, q_list):
    p = np.asarray(packed)
    v = (p[1].astype(np.uint64) << np.uint64(32)) | p[0].astype(np.uint64)
    return v % np.array(q_list, dtype=np.uint64)[:, None]


def test_forward_bit_exact(setup):
    plan, q_list, a = setup
    want = np.asarray(mxu_ntt.ntt(a, plan))
    got = np.asarray(mxu_pallas.ntt(a, plan, interpret=True,
                                    shoup_rec=False))
    np.testing.assert_array_equal(got, want)


def test_inverse_bit_exact(setup):
    plan, q_list, a = setup
    f = mxu_ntt.ntt(a, plan)
    want = np.asarray(mxu_ntt.intt_no_norm_factor(f, plan))
    got = np.asarray(mxu_pallas.intt_no_norm_factor(
        f, plan, interpret=True, shoup_rec=False))
    np.testing.assert_array_equal(got, want)


def test_shoup_recombine_mod_q(setup):
    """The Barrett/Shoup recombination produces the same values mod q as
    the Montgomery recombination, in [0, 2q)."""
    plan, q_list, a = setup
    for inv in (False, True):
        f = (mxu_pallas.intt_no_norm_factor if inv else mxu_pallas.ntt)
        want = f(a, plan, interpret=True, shoup_rec=False)
        got = f(a, plan, interpret=True, shoup_rec=True)
        gi = _canon(got, q_list)
        np.testing.assert_array_equal(gi, _canon(want, q_list))
        # lazy bound
        p = np.asarray(got)
        v = (p[1].astype(np.uint64) << np.uint64(32)) \
            | p[0].astype(np.uint64)
        assert np.all(v < 2 * np.array(q_list, dtype=np.uint64)[:, None])


def test_batched_bit_exact(setup):
    plan, q_list, a = setup
    ab = jnp.stack([a, a[:, ::-1]], axis=1)      # [2, B=2, C, N]
    want = np.asarray(mxu_ntt.ntt(ab, plan))
    got = np.asarray(mxu_pallas.ntt(ab, plan, interpret=True,
                                    shoup_rec=False))
    np.testing.assert_array_equal(got, want)


def test_ch_off_matches_resolved(setup):
    """Block-offset table indexing (a level's contiguous channel
    suffix) == gathered per-level tables."""
    plan, q_list, a = setup
    off = 2
    sub = mxu_ntt.take_channels(plan, tuple(range(off, len(q_list))))
    asub = a[:, off:]
    want = np.asarray(mxu_pallas.ntt(asub, sub, interpret=True))
    got = np.asarray(mxu_pallas.ntt(asub, plan, interpret=True,
                                    ch_off=off))
    np.testing.assert_array_equal(got, want)


def test_width_groups_dispatch(setup):
    """Per-width-group digit parameters through MxuRef dispatch: same
    values mod q as the uniform word-size tables."""
    from liberate_tpu.fhe.context.ckks_context import CkksContext, \
        primitive_root_2N as pr2N

    plan, q_list, a = setup
    groups = mxu_ntt.width_groups(q_list)
    assert len(groups) >= 2, "test params should span two widths"
    gplans = []
    for (s, e, (dA, dB)) in groups:
        qs = q_list[s:e]
        psis = [pr2N(q, 1 << LOGN) for q in qs]
        ipsis = [pow(p, -1, q) for p, q in zip(psis, qs)]
        d = mxu_ntt.make_plan(LOGN, qs, [pow(2, 62, q) for q in qs],
                              psis, ipsis,
                              [pow(1 << LOGN, -1, q) for q in qs],
                              dA=dA, dB=dB)
        sub = mxu_ntt.take_channels(plan, tuple(range(s, e)))
        gp = mxu_ntt.plan_from_dict(d, sub.ql, sub.qh, sub.kl, sub.kh,
                                    sub.q2)
        assert gp.dA <= plan.dA and gp.dB <= plan.dB
        gplans.append((s, e, gp))
    ref = mxu_ntt.MxuRef(plan, tuple(range(len(q_list))),
                         groups=tuple(gplans))
    got = mxu_pallas.dispatch(a, ref, interpret=True)
    want = mxu_pallas.ntt(a, plan, interpret=True)
    np.testing.assert_array_equal(_canon(got, q_list),
                                  _canon(want, q_list))
    goti = mxu_pallas.dispatch(mxu_pallas.ntt(a, plan, interpret=True),
                               ref, inverse=True, interpret=True)
    wanti = mxu_pallas.intt_no_norm_factor(
        mxu_pallas.ntt(a, plan, interpret=True), plan, interpret=True)
    np.testing.assert_array_equal(_canon(goti, q_list),
                                  _canon(wanti, q_list))


def test_enter_exit_folded_tables(setup):
    """m1e == transform of a*R; i2x == inverse with the Montgomery exit
    folded; post_reduce lands in [0, q). All mod q vs host-side
    oracles."""
    plan, q_list, a = setup
    qs = np.array(q_list, dtype=np.uint64)
    ai = u64.to_int64_np(np.asarray(a)).astype(np.uint64)
    R = 1 << 62
    aR = np.array([[(int(x) * R) % int(q) for x in row]
                   for row, q in zip(ai, q_list)], dtype=np.uint64)
    aRp = jnp.asarray(u64.from_int64_np(aR.astype(np.int64)))
    want = _canon(mxu_pallas.ntt(aRp, plan, interpret=True), q_list)
    got = _canon(mxu_pallas.ntt(a, plan, interpret=True, enter=True),
                 q_list)
    np.testing.assert_array_equal(got, want)

    f = mxu_pallas.ntt(a, plan, interpret=True)
    base = _canon(mxu_pallas.intt_no_norm_factor(f, plan, interpret=True),
                  q_list)
    want_x = np.array([[(int(x) * pow(R, -1, int(q))) % int(q)
                        for x in row]
                       for row, q in zip(base, q_list)], dtype=np.uint64)
    got_x = mxu_pallas.intt_no_norm_factor(f, plan, interpret=True,
                                           exitx=True)
    np.testing.assert_array_equal(_canon(got_x, q_list), want_x)
    got_r = np.asarray(mxu_pallas.intt_no_norm_factor(
        f, plan, interpret=True, exitx=True, post_reduce=True))
    v = (got_r[1].astype(np.uint64) << np.uint64(32)) \
        | got_r[0].astype(np.uint64)
    assert np.all(v < qs[:, None])
    np.testing.assert_array_equal(v % qs[:, None], want_x)


def _mxu_engine_mult(use_pallas_kernels):
    import liberate_tpu
    from liberate_tpu import config

    config.use_mxu_ntt = True
    config.use_mxu_pallas = use_pallas_kernels
    config.use_pallas = True if use_pallas_kernels else None
    config.pallas_interpret = use_pallas_kernels
    try:
        np.random.seed(31)
        eng = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                      num_special_primes=2,
                                      is_secured=False, seed=23)
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m = eng.example(amin=-1, amax=1)
        ct = eng.encorypt(m, pk)
        out = eng.mult(ct, ct, evk)
        err = abs(eng.absmax_error(eng.decrode(out, sk), m * m))
        err = float(err.real) if hasattr(err, "real") else float(err)
        qs = eng.ctx.q[out.level:eng.num_ordinary]
        return out, err, qs
    finally:
        config.use_mxu_ntt = None
        config.use_mxu_pallas = True
        config.use_pallas = None
        config.pallas_interpret = False


def test_engine_fused_mxu_switch_matches_xla():
    """The whole scheme on the MXU backend: fused Pallas kernels
    (interpret) vs the XLA einsum composition — outputs equal mod q
    (both natural-order domain; includes the fused ntt_ksk_accum switch
    through config.use_shoup_extend)."""
    a, err_a, qs = _mxu_engine_mult(True)
    b, err_b, _ = _mxu_engine_mult(False)
    assert err_a < 1e-4 and err_b < 1e-4
    qcol = np.array(qs, dtype=np.uint64)[:, None]
    for da, db in zip(a.data, b.data):
        pa, pb = np.asarray(da), np.asarray(db)
        ia = (pa[1].astype(np.uint64) << np.uint64(32)) \
            | pa[0].astype(np.uint64)
        ib = (pb[1].astype(np.uint64) << np.uint64(32)) \
            | pb[0].astype(np.uint64)
        np.testing.assert_array_equal(ia % qcol, ib % qcol)


def test_group_dispatch_multi_consumer_jit():
    """Round-5 regression: a width-group dispatch output consumed by
    MULTIPLE downstream ops inside one jit produced wrong values for the
    narrow-digit group's channels (CPU interpret AND compiled TPU) until
    mxu_pallas pinned the kernel/concat outputs with
    jax.lax.optimization_barrier. This drives the exact failing pattern:
    _cc_mult_core's B=4 enter_ntt stack fanning out into four mont_mults
    at scale_bits=40 (two width groups), jit vs eager."""
    import jax

    import liberate_tpu
    from liberate_tpu import config
    from liberate_tpu.fhe.engine import _cc_mult_core

    config.use_mxu_ntt = True
    config.use_mxu_pallas = True
    config.use_pallas = True
    config.pallas_interpret = True
    try:
        eng = liberate_tpu.CkksEngine(seed=1, logN=9, scale_bits=40,
                                      num_special_primes=2, num_scales=3,
                                      is_secured=False)
        pack = eng.pack(1, -1)
        assert len(pack.mxu.groups) >= 2, "config must span 2 width groups"
        C = int(pack.q2.shape[1])
        qs = np.array(eng.ntt.q_ints(1, -1), dtype=np.uint64)
        rng = np.random.default_rng(23)
        ds = []
        for _ in range(4):
            v = (rng.integers(0, 1 << 62, size=(C, eng.ctx.N),
                              dtype=np.uint64) % (2 * qs[:, None]))
            ds.append(jnp.asarray(u64.from_int64_np(v.astype(np.int64))))
        want = _cc_mult_core.__wrapped__(*ds, pack)   # eager
        got = _cc_mult_core(*ds, pack)                # jit
        for g, w in zip(got, want):
            gv = u64.to_int64_np(np.asarray(g)).astype(np.uint64) \
                % qs[:, None]
            wv = u64.to_int64_np(np.asarray(w)).astype(np.uint64) \
                % qs[:, None]
            np.testing.assert_array_equal(gv, wv)
    finally:
        config.use_mxu_ntt = None
        config.use_mxu_pallas = True
        config.use_pallas = None
        config.pallas_interpret = False


def test_engine_batched_mult_native_path():
    """mult_batched through the NATIVE ct-batched kernels (segmented
    part accumulation, grid (C, B*P)) — bit-exact with per-pair mults
    under the same MXU interpret config."""
    import liberate_tpu
    from liberate_tpu import config

    config.use_mxu_ntt = True
    config.use_mxu_pallas = True
    config.use_pallas = True
    config.pallas_interpret = True
    try:
        eng = liberate_tpu.CkksEngine(logN=9, scale_bits=40, num_scales=3,
                                      num_special_primes=2,
                                      is_secured=False, seed=29)
        assert eng._mxu_fused_switch()
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        msgs = [eng.example(amin=-1, amax=1) for _ in range(4)]
        cts = [eng.encorypt(m, pk) for m in msgs]
        outs = eng.mult_batched([cts[0], cts[2]], [cts[1], cts[3]], evk)
        for i, (a, b) in enumerate(((0, 1), (2, 3))):
            single = eng.mult(cts[a], cts[b], evk)
            for got, want in zip(outs[i].data, single.data):
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(want))
            err = abs(eng.absmax_error(eng.decrode(outs[i], sk),
                                       msgs[a] * msgs[b]))
            assert abs(err) < 1e-4
    finally:
        config.use_mxu_ntt = None
        config.use_mxu_pallas = True
        config.use_pallas = None
        config.pallas_interpret = False
