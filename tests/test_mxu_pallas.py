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


def test_forward_bit_exact(setup):
    plan, q_list, a = setup
    want = np.asarray(mxu_ntt.ntt(a, plan))
    got = np.asarray(mxu_pallas.ntt(a, plan, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_inverse_bit_exact(setup):
    plan, q_list, a = setup
    f = mxu_ntt.ntt(a, plan)
    want = np.asarray(mxu_ntt.intt_no_norm_factor(f, plan))
    got = np.asarray(mxu_pallas.intt_no_norm_factor(f, plan,
                                                    interpret=True))
    np.testing.assert_array_equal(got, want)


def test_batched_bit_exact(setup):
    plan, q_list, a = setup
    ab = jnp.stack([a, a[:, ::-1]], axis=1)      # [2, B=2, C, N]
    want = np.asarray(mxu_ntt.ntt(ab, plan))
    got = np.asarray(mxu_pallas.ntt(ab, plan, interpret=True))
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
        config.use_mxu_ntt = False
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
