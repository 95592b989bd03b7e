"""Native (C++) host-math runtime vs pure-Python oracles."""

import numpy as np
import pytest

from liberate_tpu import native
import importlib

cc = importlib.import_module("liberate_tpu.fhe.context.ckks_context")
from liberate_tpu.fhe.context.generate_primes import find_the_next_prime
from liberate_tpu.fhe.context.prim_test import miller_rabin


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native hostmath not built")


@requires_native
def test_miller_rabin_matches():
    known_primes = [2, 3, 61, 2**31 - 1, 2**61 - 1, 1099512938497]
    known_composites = [1, 4, 2**40, 2**31, 561, 1099512938499]
    for n in known_primes:
        assert native.miller_rabin(n) is True, n
    for n in known_composites:
        assert native.miller_rabin(n) is False, n


@requires_native
def test_find_ntt_prime_matches_python():
    N = 2 ** 10
    M = 2 * N
    got = native.find_ntt_prime(2 ** 40 + 1, M, True)
    want = find_the_next_prime(2 ** 40 + 1, M, up=True)
    assert got == want


@requires_native
def test_psi_banks_match_python():
    logN = 8
    N = 2 ** logN
    M = 2 * N
    qs = []
    q0 = 2 ** 30 + 1
    for _ in range(3):
        q0 = find_the_next_prime(q0 + 2, M, up=True)
        qs.append(q0)
    roots = [cc.primitive_root_2N(qi, N) for qi in qs]
    iroots = [pow(r, -1, qi) for r, qi in zip(roots, qs)]
    fwd_n, inv_n = native.psi_banks(qs, roots, iroots, logN)

    brev = [cc.bit_reverse(i, logN) for i in range(N)]
    for c, qi in enumerate(qs):
        series = [pow(roots[c], i, qi) for i in range(N)]
        iseries = [pow(iroots[c], i, qi) for i in range(N)]
        assert np.array_equal(fwd_n[c], np.array([series[b] for b in brev],
                                                 dtype=np.uint64))
        assert np.array_equal(inv_n[c], np.array([iseries[b] for b in brev],
                                                 dtype=np.uint64))


@requires_native
def test_primitive_root_matches():
    N = 2 ** 10
    q = find_the_next_prime(2 ** 40 + 1, 2 * N, up=True)
    assert native.primitive_root_2N(q, N) == cc.primitive_root_2N(q, N)


@requires_native
def test_chacha20_blocks_match_numpy():
    from liberate_tpu.csprng.chacha20 import chacha20_np, make_states

    rng = np.random.default_rng(3)
    key = rng.integers(0, 2 ** 32, 8, dtype=np.uint64).astype(np.uint32)
    nonce = rng.integers(0, 2 ** 32, 2, dtype=np.uint64).astype(np.uint32)
    counters = rng.integers(0, 2 ** 63, 32, dtype=np.uint64)
    got = native.chacha20_blocks(key, nonce, counters)
    states = make_states(32, key, nonce, counters)
    want, _ = chacha20_np(states, 0)
    assert np.array_equal(got, want)


@requires_native
def test_mxu_decompose_matches_python():
    from liberate_tpu.ntt import mxu_ntt

    rng = np.random.default_rng(11)
    q = find_the_next_prime(2 ** 60 + 1, 2 ** 11, up=True)
    M = rng.integers(0, q, size=(32, 48), dtype=np.uint64)
    dA, dB, _ = mxu_ntt.digit_params(62)
    got = native.mxu_decompose(M, q, dA, dB)
    assert got is not None
    # Python oracle (the exact numpy-object path)
    digs = np.zeros((dA, 32, dB, 48), dtype=np.int8)
    for v in range(dB):
        Mv = ((M.astype(object) * pow(2, 8 * v, q)) % q).astype(np.uint64)
        digs[:, :, v, :] = mxu_ntt._balanced_digits_np(Mv, dA)
    rs = (128 * digs.astype(np.int64).sum(axis=(2, 3))).astype(np.int32)
    assert np.array_equal(got[0], digs.reshape(dA, 32, dB * 48))
    assert np.array_equal(got[1], rs)
