"""Multiparty protocol tests: collective evk and collective rotation keys.

Mirrors the reference's multiparty notebooks as automated checks
(reference: examples/[Example] Multiparty Evk.ipynb, Multiparty
Rotation.ipynb protocols).
"""

import numpy as np
import pytest

import liberate_tpu


N_PARTIES = 2


@pytest.fixture(scope="module")
def eng():
    return liberate_tpu.CkksEngine(
        logN=8, scale_bits=30, num_scales=3, num_special_primes=2,
        is_secured=False, seed=99)


@pytest.fixture(scope="module")
def parties(eng):
    sks = [eng.create_secret_key() for _ in range(N_PARTIES)]
    pk0 = eng.multiparty_create_public_key(sks[0])
    crs = eng.multiparty_public_crs(pk0)
    pks = [pk0] + [eng.multiparty_create_public_key(s, a=crs)
                   for s in sks[1:]]
    cpk = eng.multiparty_create_collective_public_key(pks)
    return sks, cpk


def _threshold_decrypt(eng, ct, sks):
    pcts = [eng.multiparty_decrypt_head(ct, sks[0])]
    pcts += [eng.multiparty_decrypt_partial(ct, s) for s in sks[1:]]
    return eng.multiparty_decrypt_fusion(pcts, level=ct.level)


def test_collective_evk_mult(eng, parties):
    sks, cpk = parties
    evk_shares = [eng.create_key_switching_key(sks[0], sks[0])]
    crs = eng.generate_rotation_crs(evk_shares[0])
    evk_shares += [eng.multiparty_create_key_switching_key(s, s, a=crs)
                   for s in sks[1:]]
    evk_sum = eng.multiparty_sum_evk_share(evk_shares)
    evk_mult = [eng.multiparty_mult_evk_share_sum(evk_sum, s) for s in sks]
    cevk = eng.multiparty_sum_evk_share_mult(evk_mult)

    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, cpk)
    ctm = eng.mult(ct, ct, evk=cevk)
    dec = _threshold_decrypt(eng, ctm, sks)
    err = abs(eng.absmax_error(dec[:eng.num_slots], m * m))
    assert err < 1e-4, err


def test_collective_rotation_key(eng, parties):
    sks, cpk = parties
    rotk0 = eng.multiparty_create_rotation_key(sks[0], delta=1)
    crs = eng.generate_rotation_crs(rotk0)
    rotks = [rotk0] + [eng.multiparty_create_rotation_key(s, 1, a=crs)
                       for s in sks[1:]]
    crotk = eng.multiparty_generate_rotation_key(rotks)

    m = eng.example(amin=-1, amax=1)
    ct = eng.encorypt(m, cpk)
    rot = eng.rotate_single(ct, crotk)
    dec = _threshold_decrypt(eng, rot, sks)
    err = abs(eng.absmax_error(dec[:eng.num_slots], np.roll(m, 1)))
    assert err < 1e-4, err


def test_crs_determinism(eng):
    """Replicated common randomness: two engines with the same seed draw
    identical CRS streams — generation replaces communication
    (reference: csprng.py:33-46)."""
    e1 = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                 num_special_primes=2, is_secured=False,
                                 seed=1234)
    e2 = liberate_tpu.CkksEngine(logN=8, scale_bits=30, num_scales=3,
                                 num_special_primes=2, is_secured=False,
                                 seed=1234)
    a1 = e1.rng.randint(amax=e1.ntt.q_ints(0, -2), repeats=e1.num_special)
    a2 = e2.rng.randint(amax=e2.ntt.q_ints(0, -2), repeats=e2.num_special)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
