"""Shoup-form pointwise chains vs the Montgomery oracles.

config.use_shoup_{moddown,rescale,extend} replace the Montgomery
constant-multiply chains (mod-down, rescale, basis extension) with Shoup
precomputed-quotient multiplies (u64.shoup_mul / u64.barrett_2q). The
values mod q are identical by construction — and because every chain
ends in a canonical reduction, the ciphertext OUTPUTS agree mod q
exactly (representatives can differ only at the measure-zero rescale
rounder edge), which is what these tests pin. The engine runs the same
seed through both modes, so keys, randomness and inputs are identical.
"""

import numpy as np
import pytest

import liberate_tpu
from liberate_tpu import config
from liberate_tpu.ntt import u64

FLAGS = ("use_shoup_moddown", "use_shoup_rescale", "use_shoup_extend")


@pytest.fixture()
def restore_flags():
    prev = {f: getattr(config, f) for f in FLAGS}
    prev["use_pallas"] = config.use_pallas
    prev["pallas_interpret"] = config.pallas_interpret
    try:
        yield
    finally:
        for f, v in prev.items():
            setattr(config, f, v)


def _engine():
    return liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=6,
                                   num_special_primes=2, is_secured=False,
                                   seed=4242)


def _as_int(packed):
    p = np.asarray(packed)
    return (p[1].astype(np.uint64) << np.uint64(32)) | p[0].astype(np.uint64)


def _assert_mod_q_equal(a, b, qs):
    qs = np.asarray(qs, dtype=np.uint64)[:, None]
    ia, ib = _as_int(a), _as_int(b)
    assert ia.shape == ib.shape
    np.testing.assert_array_equal(ia % qs, ib % qs)


def _run_chain(shoup: bool, pallas: bool = False):
    """Same-seed mult + rescale + rotate-free chain under one flag set."""
    for f in FLAGS:
        setattr(config, f, shoup)
    config.use_pallas = True if pallas else None
    config.pallas_interpret = pallas
    np.random.seed(20260820)   # example() draws from the global RNG
    eng = _engine()
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    out = eng.mult(ct, ct, evk)          # rescale x2 + cc_mult + switch
    out2 = eng.rescale(out)              # standalone rescale path
    err = abs(eng.absmax_error(eng.decrode(out, sk), m * m))
    err = float(err.real) if hasattr(err, "real") else float(err)
    return eng, out, out2, err


def test_mult_chain_mod_q_equal(restore_flags):
    eng_s, a, a2, err_s = _run_chain(True)
    eng_m, b, b2, err_m = _run_chain(False)
    assert err_s < 1e-3 and err_m < 1e-3
    qs = eng_s.ctx.q[a.level:eng_s.num_ordinary]
    for da, db in zip(a.data, b.data):
        _assert_mod_q_equal(da, db, qs)
    qs2 = eng_s.ctx.q[a2.level:eng_s.num_ordinary]
    for da, db in zip(a2.data, b2.data):
        _assert_mod_q_equal(da, db, qs2)


def test_mult_chain_mod_q_equal_pallas_interpret(restore_flags):
    """Kernel path: canon=False pre-stage (Shoup) vs canon=True
    (Montgomery) through the split-switch Pallas kernels in interpret
    mode."""
    eng_s, a, _, err_s = _run_chain(True, pallas=True)
    eng_m, b, _, err_m = _run_chain(False, pallas=True)
    assert err_s < 1e-3 and err_m < 1e-3
    qs = eng_s.ctx.q[a.level:eng_s.num_ordinary]
    for da, db in zip(a.data, b.data):
        _assert_mod_q_equal(da, db, qs)


def test_barrett_2q_unit():
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for q in [(1 << 40) - 87, (1 << 59) + 7 * 2 ** 40 + 1,
              (1 << 61) - 1]:
        x = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
        bp = (1 << 64) // q
        xp = (jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
              jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))

        def pk(v):
            return (jnp.full((), v & 0xFFFFFFFF, jnp.uint32),
                    jnp.full((), v >> 32, jnp.uint32))

        r = u64.barrett_2q(xp, pk(bp), pk(q))
        ri = (np.asarray(r[1]).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(r[0]).astype(np.uint64)
        assert np.all(ri < 2 * q)
        assert np.all((ri % q) == (x % q))


def test_shoup_offset_identity():
    """(v + 2^63) * w - 2^63 * w == v * w (mod q) for wrapped-signed v —
    the extend_shoup offset trick, at the numpy-int level."""
    rng = np.random.default_rng(11)
    q = (1 << 59) + 7 * 2 ** 40 + 1
    w = int(rng.integers(1, q))
    wp = (w << 64) // q
    v = rng.integers(-(1 << 62), 1 << 62, size=256)
    u = (v.astype(np.int64).view(np.uint64)
         + np.uint64(1 << 63))          # wraps mod 2^64 == offset add
    # shoup(u, w) in python ints
    e = (int(w) * u.astype(object)) - ((wp * u.astype(object)) >> 64) * q
    e = np.array([int(t) & ((1 << 64) - 1) for t in e], dtype=object)
    assert all(int(t) < 2 * q for t in e)
    cadj = 2 * q - ((w << 63) % q)
    got = np.array([(int(t) + cadj) % q for t in e], dtype=object)
    want = np.array([(int(x) * w) % q for x in v], dtype=object)
    assert np.array_equal(got, want)
