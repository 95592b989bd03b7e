"""Counter-keyed CSPRNG orchestration.

The reference manages per-device ChaCha20 state tensors whose counters are
laid out channel-major, with "repeating" channels whose counters are
identical on every GPU so shared randomness (the public ``a``, multiparty
CRS) is generated locally-but-identically instead of communicated
(reference: src/liberate/csprng/csprng.py:18-323).

TPU-native redesign: no state tensors at all. A stream is (key, nonce,
counter), and counters are a pure function of (channel, block, step):

    counter(ch, j, step) = ch * L + j + step * inc,   inc = total_channels * L

so states are materialized *inside* the jitted kernel from a per-channel
offset — nothing is uploaded but a handful of 64-bit offsets, and the same
function evaluated on any chip or on the host yields the same bits.
Channels: one stream per ordinary (scale+base) prime, ``num_repeating``
shared streams used for special primes / errors / ternary secrets / CRS,
and one dedicated stream for encode-side random rounding.

Unlike the reference — which ignores a user-provided seed
(reference: csprng.py:215-223) — seeding here is honored and reproducible.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ntt import u64
from .chacha20 import CHACHA_CONSTANTS, chacha20_np, make_states
from .discrete_gaussian import build_CDT_binary_search_tree, sample_from_words_np

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Jitted draw kernels.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(4,))
def _chacha_words(key, nonce, off_lo, off_hi, L):
    """Generate ChaCha20 keystream for C channels x L blocks.

    key: uint32 [8]; nonce: uint32 [2]; off_lo/off_hi: uint32 [C] — the
    64-bit starting counter of each channel. Returns uint32 [C, L, 16].
    """
    C = off_lo.shape[0]
    j = jax.lax.broadcasted_iota(_U32, (C, L), 1)
    c_lo = off_lo[:, None] + j
    carry = (c_lo < off_lo[:, None]).astype(_U32)
    c_hi = off_hi[:, None] + carry

    cols = []
    for i in range(4):
        cols.append(jnp.full((C, L), CHACHA_CONSTANTS[i], dtype=_U32))
    for i in range(8):
        cols.append(jnp.broadcast_to(key[i], (C, L)))
    cols.append(c_lo)
    cols.append(c_hi)
    cols.append(jnp.broadcast_to(nonce[0], (C, L)))
    cols.append(jnp.broadcast_to(nonce[1], (C, L)))

    from .chacha20 import _block
    out = _block(cols, jnp)
    return jnp.stack(out, axis=2)


def _split_samples(words):
    """[C, L, 16] words -> x limbs (x0..x3, LSB first), each [C, 4L].

    Sample word mapping mirrors the reference kernels: x_low = (w0<<32)|w1,
    x_high = (w2<<32)|w3 (reference: randint_cuda_kernel.cu:62-101).
    """
    C, L, _ = words.shape
    w = words.reshape(C, L * 4, 4)
    return w[:, :, 1], w[:, :, 0], w[:, :, 3], w[:, :, 2]


def _acc96_add(acc, t):
    """96-bit accumulator (a0,a1,a2) += u64 t."""
    a0, a1, a2 = acc
    lo, hi = t
    a0n = a0 + lo
    c0 = (a0n < a0).astype(_U32)
    a1n = a1 + hi
    c1 = (a1n < a1).astype(_U32)
    a1n = a1n + c0
    c1 = c1 + (a1n < c0).astype(_U32)
    return a0n, a1n, a2 + c1


@jax.jit
def _uniform_from_words(words, q_lo, q_hi, shift_lo, shift_hi):
    """Unbiased range reduction: sample = ((q * x) >> 128) + shift.

    x is a 128-bit random value per sample; q < 2^62 per channel. Exactly
    the reference's reduction (reference: randint_cuda_kernel.cu:62-101).
    Returns packed [2, C, N].
    """
    x0, x1, x2, x3 = _split_samples(words)
    x = (x0, x1, x2, x3)
    q = (q_lo[:, None], q_hi[:, None])

    zero = jnp.zeros_like(x0)
    acc = (zero, zero, zero)
    outs = []
    for k in range(6):
        for a in range(2):
            b = k - a
            if 0 <= b < 4:
                acc = _acc96_add(acc, u64.mul32_wide(q[a], x[b]))
        outs.append(acc[0])
        acc = (acc[1], acc[2], zero)
    p4, p5 = outs[4], outs[5]
    s = u64.add((p4, p5), (shift_lo[:, None], shift_hi[:, None]))
    return u64.pack(*s)


@functools.partial(jax.jit, static_argnums=(2,))
def _dg_from_words(words, btree, depth):
    """CDT binary-search-tree walk -> signed two's-complement samples.

    btree: uint32 [4, num_nodes] (limbs lo0, lo1, hi0, hi1). Constant-time
    walk of ``depth`` steps (reference: discrete_gaussian_cuda_kernel.cu:62-105).
    Returns packed [2, C, N].
    """
    x0, x1, x2, x3 = _split_samples(words)
    x_low = (x0, x1)
    sign_bit = x2 & _U32(1)
    # x_high >>= 1 (127-bit magnitude).
    xh0 = (x2 >> 1) | (x3 << 31)
    xh1 = x3 >> 1
    x_high = (xh0, xh1)

    current = jnp.zeros_like(x0)
    counter = 0
    jump = 1
    for d in range(depth):
        # Select node values via a small where-chain (2^d candidates).
        n = 1 << d
        y = [jnp.zeros_like(x0) for _ in range(4)]
        for k in range(n):
            m = current == _U32(k)
            for li in range(4):
                y[li] = jnp.where(m, btree[li, counter + k], y[li])
        y_low = (y[0], y[1])
        y_high = (y[2], y[3])
        ge = u64.lt_unsigned(y_high, x_high) | (
            u64.eq(x_high, y_high) & ~u64.lt_unsigned(x_low, y_low)
        )
        current = 2 * current + ge.astype(_U32)
        counter += jump
        jump *= 2

    # sample = (2*sign - 1) * current, as two's complement.
    mag = (current, jnp.zeros_like(current))
    negmag = u64.sub((jnp.zeros_like(current), jnp.zeros_like(current)), mag)
    pos = sign_bit == _U32(1)
    s = u64.select(pos, mag, negmag)
    return u64.pack(*s)


# ---------------------------------------------------------------------------
# The orchestrator.
# ---------------------------------------------------------------------------


class Csprng:
    def __init__(self, num_coefs, num_channels, num_repeating_channels=2,
                 sigma=3.2, seed=None, nonce=None):
        """num_coefs: N. num_channels: number of ordinary-prime streams.
        num_repeating_channels: shared streams (errors/ternary/special/CRS).
        """
        self.num_coefs = num_coefs
        self.num_channels = num_channels
        self.num_repeating_channels = num_repeating_channels
        self.sigma = sigma

        # 4 words per 128-bit sample -> L blocks per channel per draw.
        self.L = num_coefs // 4
        self.L_round = max(num_coefs // 16, 1)

        # Channel map: [0, C_ord) ordinary, then repeating, then randround.
        self.total_channels = num_channels + num_repeating_channels + 1
        self.randround_channel = self.total_channels - 1
        self.inc = self.total_channels * self.L

        self.btree_u32, self.btree_np64, self.tree_depth = (
            build_CDT_binary_search_tree(security_bits=128, sigma=sigma)
        )
        self._btree_dev = jnp.asarray(self.btree_u32)

        self.refresh(seed, nonce)

    # -- state ------------------------------------------------------------------

    def refresh(self, seed=None, nonce=None):
        """(Re)seed. Unlike the reference, an explicit seed is honored;
        with a seed and no nonce the nonce is derived from the seed so a
        seeded run is fully reproducible."""
        self.key = self._words_from_seed(seed, 8)
        if nonce is None and seed is not None:
            import hashlib
            digest = hashlib.sha256(self.key.tobytes() + b"nonce").digest()
            nonce = np.frombuffer(digest[:8], dtype=np.uint32).copy()
        self.nonce = self._words_from_seed(nonce, 2)
        self._key_dev = jnp.asarray(self.key)
        self._nonce_dev = jnp.asarray(self.nonce)
        self.steps = np.zeros(self.total_channels, dtype=np.uint64)

    @staticmethod
    def _words_from_seed(seed, n_words):
        if seed is None:
            return np.frombuffer(os.urandom(4 * n_words), dtype=np.uint32).copy()
        if isinstance(seed, int):
            return np.array(
                [(seed >> (32 * i)) & 0xFFFFFFFF for i in range(n_words)],
                dtype=np.uint32,
            )
        arr = np.asarray(seed, dtype=np.uint64).astype(np.uint32)
        assert arr.size == n_words, f"seed must provide {n_words} 32-bit words"
        return arr

    def _offsets(self, channels):
        """Starting 64-bit counters for the given channels; steps advance."""
        ch = np.asarray(channels, dtype=np.uint64)
        off = ch * np.uint64(self.L) + self.steps[ch] * np.uint64(self.inc)
        self.steps[ch] += np.uint64(1)
        return ((off & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (off >> np.uint64(32)).astype(np.uint32))

    def _draw_words(self, channels, nblocks=None):
        off_lo, off_hi = self._offsets(channels)
        return _chacha_words(self._key_dev, self._nonce_dev,
                             jnp.asarray(off_lo), jnp.asarray(off_hi),
                             nblocks or self.L)

    def _channel_plan(self, n_dedicated, repeats, start=0):
        """Last n_dedicated ordinary streams' tail + first ``repeats``
        repeating streams (the reference's share layout,
        reference: csprng.py:249-280)."""
        ord_ch = list(range(self.num_channels - n_dedicated,
                            self.num_channels))
        rep_ch = list(range(self.num_channels,
                            self.num_channels + repeats))
        return ord_ch + rep_ch

    # -- public draws ------------------------------------------------------------

    def randint(self, amax=3, shift=0, repeats=0):
        """Uniform ints in [shift, amax+shift) per channel; packed [2, C, N].

        amax: int (single shared-modulus channel set) or list of per-channel
        moduli. When ``repeats`` > 0 the trailing ``repeats`` channels use
        the repeating streams (identical on every shard/host).
        """
        if not isinstance(amax, (list, tuple)):
            amax = [amax] * max(repeats, 1)
        n_ded = len(amax) - repeats
        channels = self._channel_plan(n_ded, repeats)
        words = self._draw_words(channels)
        q = np.array([int(a) & 0xFFFFFFFFFFFFFFFF for a in amax],
                     dtype=np.uint64)
        sh = np.full(len(amax), np.int64(shift)).view(np.uint64)
        return _uniform_from_words(
            words,
            jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((q >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((sh & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((sh >> np.uint64(32)).astype(np.uint32)),
        )

    def discrete_gaussian(self, non_repeats=0, repeats=1):
        """sigma=3.2 discrete Gaussian; packed two's-complement [2, C, N]."""
        channels = self._channel_plan(non_repeats, repeats)
        words = self._draw_words(channels)
        return _dg_from_words(words, self._btree_dev, self.tree_depth)

    def randround(self, coef):
        """Stochastic rounding of float64 coefficients (host-side).

        coef: float64 numpy [N]. Rounds |x| up with probability frac(|x|)
        using one 32-bit random word per coefficient
        (reference: randround_cuda_kernel.cu:8-36). Returns int64 [N].
        """
        coef = np.asarray(coef, dtype=np.float64)
        words = self.host_words(self.randround_channel, self.L_round).ravel()
        r = words[: coef.size].astype(np.uint64)

        sign = np.signbit(coef)
        a = np.abs(coef)
        integ = np.floor(a)
        frac = a - integ
        # Round-to-nearest-even of frac * 2^32, like CUDA __double2ll_rn.
        ifrac = np.rint(frac * float(1 << 32)).astype(np.uint64)
        rounded = (r < ifrac).astype(np.int64)
        return np.where(sign, -1, 1) * (integ.astype(np.int64) + rounded)

    def randbytes(self, channels=None, nblocks=None):
        """Raw keystream words for the given channels; uint32 [C, L, 16]."""
        if channels is None:
            channels = list(range(self.num_channels))
        return self._draw_words(channels, nblocks)

    # -- host mirrors (bit-identical to the device path) --------------------------

    def host_words(self, channel, nblocks):
        """Host evaluation of one channel's stream (advances its step).

        Uses the native C++ ChaCha20 when available (the numpy block
        function dominates host-side encode otherwise); both paths are
        bit-identical to the device kernel.
        """
        off_lo, off_hi = self._offsets([channel])
        off = (np.uint64(off_hi[0]) << np.uint64(32)) | np.uint64(off_lo[0])
        counters = off + np.arange(nblocks, dtype=np.uint64)

        from .. import native

        words = native.chacha20_blocks(self.key, self.nonce, counters)
        if words is not None:
            return words
        states = make_states(nblocks, self.key, self.nonce, counters)
        words, _ = chacha20_np(states, 0)
        return words

    def host_discrete_gaussian(self, channel, n):
        words = self.host_words(channel, -(-n // 4))
        return sample_from_words_np(words.ravel(), self.btree_np64,
                                    self.tree_depth)[:n]
