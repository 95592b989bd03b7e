"""CSPRNG tests: ChaCha20 known-answer vectors, determinism, distributions."""

import numpy as np
import pytest

from liberate_tpu.csprng import chacha20_np, make_states
from liberate_tpu.csprng.csprng import Csprng
from liberate_tpu.csprng.discrete_gaussian import (
    build_CDT_binary_search_tree,
    sample_from_words_np,
)
from liberate_tpu.ntt import u64


def test_chacha20_ietf_vector():
    """RFC 7539 section 2.3.2 test vector (block function core).

    The RFC layout uses a 32-bit counter + 96-bit nonce; the djb layout used
    here has a 64-bit counter (words 12-13) + 64-bit nonce (words 14-15).
    Word-wise, the RFC state [counter, n0, n1, n2] equals ours with
    counter64 = (n0 << 32) | counter and nonce = (n1, n2) — the permutation
    core is identical, so the keystream must match the RFC vector.
    """
    key = np.array(
        [0x03020100, 0x07060504, 0x0B0A0908, 0x0F0E0D0C,
         0x13121110, 0x17161514, 0x1B1A1918, 0x1F1E1D1C], dtype=np.uint32)
    counter = 1
    n0, n1, n2 = 0x09000000, 0x4A000000, 0x00000000
    counter64 = (n0 << 32) | counter
    states = make_states(1, key, np.array([n1, n2], dtype=np.uint32),
                         np.array([counter64], dtype=np.uint64))
    out, _ = chacha20_np(states, 1)
    expect = np.array(
        [0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
         0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
         0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
         0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2], dtype=np.uint32)
    assert np.array_equal(out[0], expect)


def test_device_host_bit_identical():
    """The jitted device path and host mirror produce the same bits."""
    rng = Csprng(num_coefs=64, num_channels=3, num_repeating_channels=2,
                 seed=12345, nonce=777)
    dev_words = np.asarray(rng._draw_words([0, 1]))
    rng2 = Csprng(num_coefs=64, num_channels=3, num_repeating_channels=2,
                  seed=12345, nonce=777)
    host0 = rng2.host_words(0, rng2.L)
    host1 = rng2.host_words(1, rng2.L)
    assert np.array_equal(dev_words[0], host0)
    assert np.array_equal(dev_words[1], host1)


def test_seeded_determinism_and_stepping():
    a = Csprng(64, 2, 2, seed=1)
    b = Csprng(64, 2, 2, seed=1)
    x1 = np.asarray(a.randint(amax=[17, 1000003], shift=0))
    y1 = np.asarray(b.randint(amax=[17, 1000003], shift=0))
    assert np.array_equal(x1, y1)
    # Counters advance: the next draw differs.
    x2 = np.asarray(a.randint(amax=[17, 1000003], shift=0))
    assert not np.array_equal(x1, x2)
    # Different seeds differ.
    c = Csprng(64, 2, 2, seed=2)
    z1 = np.asarray(c.randint(amax=[17, 1000003], shift=0))
    assert not np.array_equal(x1, z1)


def test_randint_range_and_uniformity():
    N = 4096
    q = (1 << 61) + 1  # worst case near the top
    rng = Csprng(N, 2, 2, seed=42)
    out = u64.to_int64_np(np.asarray(rng.randint(amax=[q, 3], shift=0)))
    assert out.shape == (2, N)
    assert out[0].min() >= 0 and out[0].max() < q
    assert out[1].min() >= 0 and out[1].max() < 3
    # Roughly uniform thirds for the ternary channel.
    counts = np.bincount(out[1], minlength=3)
    assert abs(counts[0] - N / 3) < 6 * np.sqrt(N)
    # Top channel mean ~ q/2.
    assert abs(out[0].mean() / q - 0.5) < 0.05


def test_randint_ternary_shift():
    rng = Csprng(1024, 2, 2, seed=7)
    out = u64.to_int64_np(np.asarray(rng.randint(amax=3, shift=-1, repeats=1)))
    assert set(np.unique(out)) <= {-1, 0, 1}


def test_repeating_channels_shared():
    """Repeats draw from shared streams: two 'parties' with the same seed
    get identical repeated randomness (generation replaces communication)."""
    a = Csprng(256, 4, 2, seed=99)
    b = Csprng(256, 4, 2, seed=99)
    # Different ordinary channel counts drawn, same repeats.
    x = np.asarray(a.randint(amax=[5, 7, 3, 3], shift=0, repeats=2))
    y = np.asarray(b.randint(amax=[11, 13, 3, 3], shift=0, repeats=2))
    # Last two channels (repeating) produced identical raw words -> with
    # identical moduli the samples agree.
    assert np.array_equal(x[:, 2:], y[:, 2:])


def test_cdt_tree():
    btree_u32, btree64, depth = build_CDT_binary_search_tree()
    assert depth == 5
    assert btree64.shape == (31, 2)
    # Root is the CDT midpoint; values ascend along the leftmost path.
    assert btree64[0, 1] > 0


def test_discrete_gaussian_device_vs_host():
    N = 1024
    rng = Csprng(N, 2, 2, seed=31337)
    dev = u64.to_int64_np(np.asarray(rng.discrete_gaussian(repeats=1)))[0]
    rng2 = Csprng(N, 2, 2, seed=31337)
    host = rng2.host_discrete_gaussian(rng2.num_channels, N)
    assert np.array_equal(dev, host)


def test_discrete_gaussian_distribution():
    N = 1 << 14
    rng = Csprng(N, 2, 2, seed=5)
    s = u64.to_int64_np(np.asarray(rng.discrete_gaussian(repeats=1)))[0]
    sigma = 3.2
    assert abs(s.mean()) < 5 * sigma / np.sqrt(N)
    assert abs(s.std() - sigma) < 0.1
    assert np.abs(s).max() <= 31


def test_randround():
    N = 1024
    rng = Csprng(N, 2, 2, seed=11)
    x = np.full(N, 2.25)
    r = rng.randround(x)
    frac_up = (r == 3).mean()
    assert abs(frac_up - 0.25) < 0.1
    assert set(np.unique(r)) <= {2, 3}
    # Negative values round away from zero with prob frac(|x|).
    r2 = rng.randround(np.full(N, -1.75))
    assert set(np.unique(r2)) <= {-1, -2}
    assert abs((r2 == -2).mean() - 0.75) < 0.1
    # Integers stay exact.
    assert np.array_equal(rng.randround(np.array([3.0, -4.0, 0.0])),
                          np.array([3, -4, 0]))
