"""Encode/decode roundtrip and permutation-semantics tests (host fp64)."""

import numpy as np
import pytest

from liberate_tpu.csprng.csprng import Csprng
from liberate_tpu.fhe.encdec import (
    conjugate_perm_data,
    decode,
    encode,
    rotate_perm_data,
)

N = 256
SCALE = float(2 ** 40)


@pytest.fixture()
def rng():
    return Csprng(N, 2, 2, seed=2024)


def roundtrip(m, rng):
    poly = encode(m, rng=rng, scale=SCALE)
    return decode(poly.astype(np.float64), scale=SCALE)[: N // 2]


def test_encode_decode_roundtrip(rng):
    g = np.random.default_rng(0)
    m = g.uniform(-10, 10, N // 2) + 1j * g.uniform(-10, 10, N // 2)
    got = roundtrip(m, rng)
    assert np.abs(got - m).max() < 1e-8


def test_encode_real_poly(rng):
    m = np.ones(N // 2)
    poly = encode(m, rng=rng, scale=SCALE)
    assert poly.dtype == np.int64
    # Constant message: all energy in the DC coefficient.
    assert abs(poly[0] - SCALE) <= 1.0
    assert np.abs(poly[1:]).max() <= 1.0


def test_rotation_via_coefficient_permutation(rng):
    """Applying the rotate permutation on coefficients rotates slots."""
    g = np.random.default_rng(1)
    m = g.uniform(-1, 1, N // 2) + 1j * g.uniform(-1, 1, N // 2)
    poly = encode(m, rng=rng, scale=SCALE).astype(np.float64)
    for delta in (1, 2, 5, N // 2 - 1):
        gather, neg = rotate_perm_data(N, delta)
        rot = np.where(neg, -poly[gather], poly[gather])
        got = decode(rot, scale=SCALE)[: N // 2]
        want = np.roll(m, delta)  # rotate(delta) shifts slots right by delta
        assert np.abs(got - want).max() < 1e-8, delta


def test_conjugation_via_coefficient_permutation(rng):
    g = np.random.default_rng(2)
    m = g.uniform(-1, 1, N // 2) + 1j * g.uniform(-1, 1, N // 2)
    poly = encode(m, rng=rng, scale=SCALE).astype(np.float64)
    gather, neg = conjugate_perm_data(N)
    conj = np.where(neg, -poly[gather], poly[gather])
    got = decode(conj, scale=SCALE)[: N // 2]
    assert np.abs(got - np.conj(m)).max() < 1e-8


def test_slotwise_multiplication_is_negacyclic_product(rng):
    """Negacyclic polynomial product == slotwise message product."""
    g = np.random.default_rng(3)
    a = g.uniform(-1, 1, N // 2) + 1j * g.uniform(-1, 1, N // 2)
    b = g.uniform(-1, 1, N // 2) + 1j * g.uniform(-1, 1, N // 2)
    pa = encode(a, rng=rng, scale=SCALE).astype(np.float64)
    pb = encode(b, rng=rng, scale=SCALE).astype(np.float64)
    # Negacyclic convolution via numpy (float64, exact enough at N=256).
    full = np.convolve(pa, pb)
    prod = full[:N].copy()
    prod[: N - 1] -= full[N:]
    got = decode(prod, scale=SCALE * SCALE)[: N // 2]
    assert np.abs(got - a * b).max() < 1e-6
