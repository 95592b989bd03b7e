"""MXU (matmul) NTT backend: exactness vs brute force and the golden model.

The MXU transform outputs natural order (a fixed permutation of the
classic bit-reversed butterfly output); interchangeability is by
pointwise-domain equivalence, so the tests check (1) forward == brute
force evaluation, (2) roundtrip identity, (3) negacyclic convolution via
the MXU domain == the golden composed result, canonically.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from liberate_tpu.fhe.context.ckks_context import CkksContext, primitive_root_2N
from liberate_tpu.ntt import golden, mxu_ntt, u64
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
    rng = np.random.default_rng(5)
    qs = np.array(q_list, dtype=np.uint64)
    a_int = (rng.integers(0, 1 << 62, size=(C, ctx.N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    return ctx, nc, plan, q_list, psis, a_int


def _canon(packed, q_list):
    v = u64.to_int64_np(np.asarray(packed)).astype(np.uint64)
    return v % np.array(q_list, dtype=np.uint64)[:, None]


def test_forward_matches_bruteforce(setup):
    ctx, nc, plan, q_list, psis, a_int = setup
    a = jnp.asarray(u64.from_int64_np(a_int))
    got = _canon(mxu_ntt.ntt(a, plan), q_list)
    N = ctx.N
    # brute force on two channels (one message-sized, one scale-sized)
    for c in (0, len(q_list) - 1):
        q, psi = q_list[c], psis[c]
        W = psi * psi % q
        av = [int(x) for x in a_int[c]]
        k = np.arange(N)
        for kk in (0, 1, 7, N - 1):
            want = sum(av[n] * pow(psi, n, q) * pow(W, (n * kk) % N, q)
                       for n in range(N)) % q
            assert got[c, kk] == want, (c, kk)


def test_roundtrip_identity(setup):
    ctx, nc, plan, q_list, psis, a_int = setup
    a = jnp.asarray(u64.from_int64_np(a_int))
    back = mxu_ntt.intt_no_norm_factor(mxu_ntt.ntt(a, plan), plan)
    assert np.array_equal(_canon(back, q_list), _canon(a, q_list))


def test_batched_shapes(setup):
    ctx, nc, plan, q_list, psis, a_int = setup
    a = jnp.asarray(u64.from_int64_np(a_int))
    ab = jnp.stack([a, a], axis=1)        # [2, B=2, C, N]
    f = mxu_ntt.ntt(ab, plan)
    assert f.shape == ab.shape
    single = mxu_ntt.ntt(a, plan)
    assert np.array_equal(np.asarray(f[:, 0]), np.asarray(single))
    assert np.array_equal(np.asarray(f[:, 1]), np.asarray(single))


def test_negacyclic_convolution_matches_golden(setup):
    ctx, nc, plan, q_list, psis, a_int = setup
    C, N = a_int.shape
    rng = np.random.default_rng(6)
    qs = np.array(q_list, dtype=np.uint64)
    b_int = (rng.integers(0, 1 << 62, size=(C, N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)

    # golden composed path: aR = mont_enter(a); c = intt(mont_mult(ntt(aR),
    # ntt(b))) gives the negacyclic product a*b (R factors cancel).
    pk = nc.level_pack(0, -2)
    ql = np.asarray(pk.ql).astype(np.int64)[:, None]
    qh = np.asarray(pk.qh).astype(np.int64)[:, None]
    kl = np.asarray(pk.kl).astype(np.int64)[:, None]
    kh = np.asarray(pk.kh).astype(np.int64)[:, None]
    q2 = u64.to_int64_np(np.asarray(pk.q2))[:, None]
    Rs = u64.to_int64_np(np.asarray(pk.Rs))[:, None]
    Ninv = u64.to_int64_np(np.asarray(pk.Ninv))[:, None]
    psi_m = u64.to_int64_np(np.asarray(pk.psi))
    ipsi_m = u64.to_int64_np(np.asarray(pk.ipsi))

    aR = golden.mont_mult(a_int, Rs, ql, qh, kl, kh)
    fa = golden.ntt(aR, psi_m, q2, ql, qh, kl, kh)
    fb = golden.ntt(b_int, psi_m, q2, ql, qh, kl, kh)
    prod = golden.mont_mult(fa, fb, ql, qh, kl, kh)
    want = golden.intt(prod, ipsi_m, Ninv, q2, ql, qh, kl, kh)
    want = _canon(u64.from_int64_np(want), q_list)

    # MXU path, same Montgomery choreography
    a_p = jnp.asarray(u64.from_int64_np(
        golden.mont_mult(a_int, Rs, ql, qh, kl, kh)))
    b_p = jnp.asarray(u64.from_int64_np(b_int))
    fa_m = mxu_ntt.ntt(a_p, plan)
    fb_m = mxu_ntt.ntt(b_p, plan)
    from liberate_tpu.ntt import ops
    prod_m = ops.mont_mult(fa_m, fb_m, pk)
    got = _canon(mxu_ntt.intt_no_norm_factor(prod_m, plan), q_list)
    assert np.array_equal(got, want)


def test_engine_mxu_backend_end_to_end():
    """The whole scheme through the MXU (matmul) NTT backend
    (config.use_mxu_ntt): keygen, enc/dec, mult+relin+rescale, rotation.
    The natural-order NTT domain replaces the bit-reversed one engine-wide
    (all ops.ntt/intt call sites dispatch on pack.mxu), so correctness at
    scheme tolerances is the right equivalence check — outputs cannot be
    bit-compared to the butterfly backend."""
    from liberate_tpu import config
    from liberate_tpu.fhe.engine import CkksEngine

    config.use_mxu_ntt = True
    try:
        eng = CkksEngine(logN=8, scale_bits=30, num_scales=3,
                         num_special_primes=2, is_secured=False, seed=23)
        assert eng.ntt.level_pack(0, -2).mxu is not None
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m1 = np.full(eng.num_slots, 0.5 + 0.25j)
        m2 = np.full(eng.num_slots, -0.75 + 0.125j)
        c1 = eng.encorypt(m1, pk)
        c2 = eng.encorypt(m2, pk)
        assert abs(eng.absmax_error(eng.decrode(c1, sk), m1)) < 1e-6
        prod = eng.mult(c1, c2, evk)
        assert abs(eng.absmax_error(eng.decrode(prod, sk), m1 * m2)) < 1e-5
        gk = eng.create_galois_key(sk)
        rot = eng.rotate_galois(c1, gk, 3)
        assert abs(eng.absmax_error(eng.decrode(rot, sk),
                                    np.roll(m1, 3))) < 1e-5
    finally:
        config.use_mxu_ntt = None


@pytest.mark.slow
def test_engine_mxu_backend_on_mesh():
    """MXU backend on an 8-device rns mesh: level-pack tables are sliced
    eagerly and channel-sharded, part packs replicated — every NTT call
    site stays in the natural-order domain."""
    from liberate_tpu import config
    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.parallel import make_mesh

    config.use_mxu_ntt = True
    try:
        eng = CkksEngine(logN=8, scale_bits=30, num_scales=3,
                         num_special_primes=2, is_secured=False, seed=5,
                         mesh=make_mesh(8))
        pk0 = eng.pack(0, -2)
        assert pk0.mxu is not None and pk0.pallas is None
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m = np.full(eng.num_slots, 0.25 - 0.5j)
        ct = eng.encorypt(m, pk)
        assert abs(eng.absmax_error(eng.decrode(ct, sk), m)) < 1e-6
        prod = eng.mult(ct, ct, evk)
        assert abs(eng.absmax_error(eng.decrode(prod, sk), m * m)) < 1e-5
    finally:
        config.use_mxu_ntt = None


def test_30bit_word_mode_roundtrip():
    """dB=dA=4 digit path (single recombination montmul per element)."""
    ctx = CkksContext(logN=6, scale_bits=26, buffer_bit_length=30,
                      num_scales=2, num_special_primes=1, is_secured=False)
    nc = NttContext(ctx)
    q_list = nc.q_ints(0, -2)
    psis = [primitive_root_2N(q, ctx.N) for q in q_list]
    ipsis = [pow(p, -1, q) for p, q in zip(psis, q_list)]
    Rms = [ctx.R % q for q in q_list]
    Ninvs = [pow(ctx.N, -1, q) for q in q_list]
    d = mxu_ntt.make_plan(ctx.logN, q_list, Rms, psis, ipsis, Ninvs,
                          word_bits=30)
    assert d["dA"] == 4 and d["dB"] == 4 and d["split"] == 4
    pack = nc.level_pack(0, -2)
    plan = mxu_ntt.plan_from_dict(d, pack.ql, pack.qh, pack.kl, pack.kh,
                                  pack.q2)
    rng = np.random.default_rng(8)
    qs = np.array(q_list, dtype=np.uint64)
    a_int = (rng.integers(0, 1 << 30, size=(len(q_list), ctx.N),
                          dtype=np.uint64) % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))
    back = mxu_ntt.intt_no_norm_factor(mxu_ntt.ntt(a, plan), plan)
    assert np.array_equal(_canon(back, q_list), _canon(a, q_list))


def test_engine_mxu_kernels_on_mesh_interpret():
    """Fused MXU kernels on a channel-SHARDED 8-device rns mesh:
    mxu_pallas.dispatch runs per-shard under jax.shard_map (round-5,
    VERDICT r4 #6) with interpret-mode kernels. Same engine flow as
    test_engine_mxu_backend_on_mesh; the level packs' table arrays are
    mesh-sharded so each virtual device transforms its local channels."""
    from liberate_tpu import config
    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.parallel import make_mesh

    config.use_mxu_ntt = True
    config.use_mxu_pallas = True
    config.use_pallas = True
    config.pallas_interpret = True
    try:
        eng = CkksEngine(logN=8, scale_bits=30, num_scales=3,
                         num_special_primes=2, is_secured=False, seed=5,
                         mesh=make_mesh(8))
        ref = eng.pack(0, -2).mxu
        assert ref is not None and ref.on_mesh
        # the padded level-0 layout is divisible -> sharded tables
        assert ref.mesh is not None, "expected a channel-sharded mesh ref"
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        m = np.full(eng.num_slots, 0.25 - 0.5j)
        ct = eng.encorypt(m, pk)
        assert abs(eng.absmax_error(eng.decrode(ct, sk), m)) < 1e-6
        prod = eng.mult(ct, ct, evk)
        assert abs(eng.absmax_error(eng.decrode(prod, sk), m * m)) < 1e-5
    finally:
        config.use_mxu_ntt = None
        config.use_mxu_pallas = True
        config.use_pallas = None
        config.pallas_interpret = False
