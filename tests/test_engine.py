"""End-to-end scheme tests for the CKKS engine.

Replicates the reference's notebook-level validation (absmax error oracles;
reference: examples/[Example] Evaluators.ipynb, utils/helpers.py:18-41) as
an automated suite on a small parameter set. Error bounds: enc/dec
roundtrip ~2^-scale_bits; one mult ~10x that.
"""

import numpy as np
import pytest

import liberate_tpu
from liberate_tpu.fhe.presets import errors


LOGN = 8
SCALE_BITS = 30
ROUNDTRIP_TOL = 1e-6
MULT_TOL = 1e-5


@pytest.fixture(scope="session")
def eng(shared_eng):
    return shared_eng


@pytest.fixture(scope="session")
def keys(shared_keys):
    return shared_keys


def err(eng, x, y):
    return abs(eng.absmax_error(x, y))


def test_encrypt_decrypt_roundtrip(eng, keys):
    sk, pk, _ = keys
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    assert err(eng, eng.decrode(ct, sk), m) < ROUNDTRIP_TOL


def test_encrypt_decrypt_at_levels(eng, keys):
    sk, pk, _ = keys
    m = eng.example(amin=-1, amax=1)
    # First levels plus the deepest: covers the alternating-scale prime
    # ends without tracing an encrypt program for every level in between.
    for level in (0, 1, 2, eng.num_levels - 1):
        ct = eng.encorypt(m, pk, level=level)
        assert err(eng, eng.decrode(ct, sk), m) < ROUNDTRIP_TOL, level


def test_separate_encode_encrypt(eng, keys):
    sk, pk, _ = keys
    m = eng.example(amin=-1, amax=1)
    pt = eng.encode(m)
    ct = eng.encrypt(pt, pk)
    dec = eng.decode(eng.decrypt(ct, sk))
    assert err(eng, dec, m) < ROUNDTRIP_TOL


def test_add_sub(eng, keys):
    sk, pk, _ = keys
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)
    assert err(eng, eng.decrode(eng.add(ct1, ct2), sk), m1 + m2) < ROUNDTRIP_TOL
    assert err(eng, eng.decrode(eng.sub(ct1, ct2), sk), m1 - m2) < ROUNDTRIP_TOL


def test_cc_mult_and_chain(eng, keys):
    sk, pk, evk = keys
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)
    ctm = eng.mult(ct1, ct2, evk)
    assert ctm.level == 1
    assert err(eng, eng.decrode(ctm, sk), m1 * m2) < MULT_TOL
    # Mismatched levels exercise auto_level/level_up.
    ctm2 = eng.mult(ctm, ct2, evk)
    assert err(eng, eng.decrode(ctm2, sk), m1 * m2 * m2) < MULT_TOL


def test_square(eng, keys):
    sk, pk, evk = keys
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    assert err(eng, eng.decrode(eng.square(ct, evk), sk), m * m) < MULT_TOL


def test_scalar_ops(eng, keys):
    sk, pk, evk = keys
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    assert err(eng, eng.decrode(eng.add(ct, 0.5), sk), m + 0.5) < ROUNDTRIP_TOL
    assert err(eng, eng.decrode(eng.sub(ct, 0.5), sk), m - 0.5) < ROUNDTRIP_TOL
    assert err(eng, eng.decrode(eng.mult(ct, 2.5), sk), m * 2.5) < MULT_TOL
    assert err(eng, eng.decrode(eng.mult(3, ct), sk), 3 * m) < ROUNDTRIP_TOL
    assert err(eng, eng.decrode(eng.negate(ct), sk), -m) < ROUNDTRIP_TOL


def test_message_ops(eng, keys):
    sk, pk, evk = keys
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m1, pk)
    assert err(eng, eng.decrode(eng.add(ct, m2), sk), m1 + m2) < ROUNDTRIP_TOL
    assert err(eng, eng.decrode(eng.mult(ct, m2), sk), m1 * m2) < MULT_TOL


def test_rotate_galois(eng, keys):
    sk, pk, _ = keys
    gk = eng.create_galois_key(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    # Reference convention: rotate by delta == np.roll(m, delta)
    # (reference: examples/[Example] Evaluators.ipynb rotation cells).
    for delta in (1, 3):
        rot = eng.rotate_galois(ct, gk, delta)
        assert err(eng, eng.decrode(rot, sk), np.roll(m, delta)) < MULT_TOL, delta


def test_conjugate(eng, keys):
    sk, pk, _ = keys
    conjk = eng.create_conjugation_key(sk)
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    conj = eng.conjugate(ct, conjk)
    assert err(eng, eng.decrode(conj, sk), np.conj(m)) < MULT_TOL


def test_sum_and_mean(eng, keys):
    sk, pk, evk = keys
    gk = eng.create_galois_key(sk)
    m = eng.example(amin=-1, amax=1) / eng.num_slots
    ct = eng.encorypt(m, pk)
    total = eng.sum(ct, gk)
    want = np.full_like(m, m.sum())
    assert err(eng, eng.decrode(total, sk), want) < MULT_TOL
    mean = eng.mean(eng.encorypt(m, pk), gk)
    assert err(eng, eng.decrode(mean, sk), np.full_like(m, m.mean())) < MULT_TOL


def test_max_level_raises(eng, keys):
    sk, pk, _ = keys
    ct = eng.encorypt(eng.example(amin=-1, amax=1), pk,
                      level=eng.num_levels - 1)
    with pytest.raises(errors.MaximumLevelError):
        eng.rescale(ct)


def test_type_errors(eng, keys):
    sk, pk, _ = keys
    with pytest.raises(errors.NotMatchType):
        eng.create_public_key(pk)
    with pytest.raises(errors.NotMatchType):
        eng.create_evk(pk)


def test_wrong_key_garbage(eng, keys):
    sk, pk, _ = keys
    sk2 = eng.create_secret_key()
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    assert err(eng, eng.decrode(ct, sk2), m) > 1.0


def test_save_load_roundtrip(eng, keys, tmp_path):
    sk, pk, _ = keys
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    fn = eng.save(ct, tmp_path / "ct.pkl")
    ct2 = eng.load(fn)
    assert err(eng, eng.decrode(ct2, sk), m) < ROUNDTRIP_TOL


def test_multiparty_threshold_decrypt(eng, keys):
    """3-party collective pk + threshold decryption
    (reference: examples/MultiParty Enc & Dec notebook protocol)."""
    sks = [eng.create_secret_key() for _ in range(3)]
    pk0 = eng.multiparty_create_public_key(sks[0], include_special=False)
    crs = eng.multiparty_public_crs(pk0)
    pks = [pk0] + [eng.multiparty_create_public_key(s, a=crs)
                   for s in sks[1:]]
    cpk = eng.multiparty_create_collective_public_key(pks)

    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, cpk)

    pcts = [eng.multiparty_decrypt_head(ct, sks[0])]
    pcts += [eng.multiparty_decrypt_partial(ct, s) for s in sks[1:]]
    dec = eng.multiparty_decrypt_fusion(pcts, level=ct.level)
    assert err(eng, dec[:eng.num_slots], m) < MULT_TOL


def test_tiled_rescale_bit_exact(eng, keys):
    """_rescale_core_tiled produces the identical ciphertext to the flat
    core (same op chain on a 4-D view)."""
    import numpy as np
    from liberate_tpu import config
    from liberate_tpu.fhe import engine as engine_mod

    sk, pk, evk = keys
    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, pk)
    flat = eng.rescale(ct)
    config.use_tiled_rescale = True
    try:
        tiled = eng.rescale(ct)
    finally:
        config.use_tiled_rescale = False
    for a, b in zip(flat.data, tiled.data):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_tiled_extend_bit_exact():
    """The tiled pre_extend/extend (config.use_tiled_extend) produces the
    bit-identical switched ciphertext (fresh engines so the per-level
    switcher caches don't mix the two traces)."""
    import numpy as np
    from liberate_tpu import config
    from liberate_tpu.fhe.engine import CkksEngine

    params = dict(logN=8, scale_bits=30, num_scales=5,
                  num_special_primes=2, is_secured=False, seed=31)
    # One shared message: example() draws from the global numpy RNG, so
    # each run must see identical inputs for bit-comparison.
    rng = np.random.default_rng(99)
    shared_m = rng.uniform(-1, 1, 128) + 1j * rng.uniform(-1, 1, 128)

    def run(tiled):
        config.use_tiled_extend = tiled
        try:
            e = CkksEngine(**params)
            sk = e.create_secret_key()
            pk = e.create_public_key(sk)
            evk = e.create_evk(sk)
            ct = e.mult(e.encorypt(shared_m, pk), e.encorypt(shared_m, pk),
                        evk)
            return ct
        finally:
            config.use_tiled_extend = False

    flat, tiled = run(False), run(True)
    for a, b in zip(flat.data, tiled.data):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mult_batched_bit_exact(eng, keys):
    """mult_batched (vmapped fused program) returns EXACTLY the arrays
    the per-pair fused mult produces — vmap only adds a batch grid
    axis."""
    sk, pk, evk = keys
    msgs = [eng.example(amin=-1, amax=1) for _ in range(4)]
    cts = [eng.encorypt(m, pk) for m in msgs]
    outs = eng.mult_batched([cts[0], cts[2]], [cts[1], cts[3]], evk)
    assert len(outs) == 2
    for i, (a, b) in enumerate(((0, 1), (2, 3))):
        single = eng.mult(cts[a], cts[b], evk)
        assert outs[i].level == single.level
        for got, want in zip(outs[i].data, single.data):
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))
        assert err(eng, eng.decrode(outs[i], sk),
                   msgs[a] * msgs[b]) < MULT_TOL
