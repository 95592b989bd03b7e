"""ChaCha20 block function, vectorized in JAX (device) and NumPy (host).

Counter-mode ChaCha20 in the original djb layout the reference uses
(reference: src/liberate/csprng/chacha20_cuda_kernel.h,
chacha20_cuda_kernel.cu): 16 uint32 words per state row —
[0:4) "expand 32-byte k" constants, [4:12) key, [12:14) 64-bit block
counter, [14:16) nonce. Each call produces 16 output words per row
(the serialized keystream block) and steps the counter.

Identical (key, counter, nonce) produce identical bits on every chip and on
the host — generation replaces communication for common reference strings
(the TPU-native equivalent of the reference's repeated CSPRNG channels,
reference: csprng.py:33-46).
"""

import jax
import jax.numpy as jnp
import numpy as np

CHACHA_CONSTANTS = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)

_QUARTER_ROUNDS = (
    (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
    (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
)


def _rotl(x, n, xp):
    return (x << n) | (x >> (32 - n))


def _block(state_cols, xp):
    """state_cols: list of 16 arrays (one per word). Returns output words."""
    x = list(state_cols)
    for _ in range(10):
        for a, b, c, d in _QUARTER_ROUNDS:
            x[a] = x[a] + x[b]
            x[d] = _rotl(x[d] ^ x[a], 16, xp)
            x[c] = x[c] + x[d]
            x[b] = _rotl(x[b] ^ x[c], 12, xp)
            x[a] = x[a] + x[b]
            x[d] = _rotl(x[d] ^ x[a], 8, xp)
            x[c] = x[c] + x[d]
            x[b] = _rotl(x[b] ^ x[c], 7, xp)
    return [xi + si for xi, si in zip(x, state_cols)]


def chacha20_block_jnp(states):
    """states: uint32 [rows, 16] -> (keystream uint32 [rows, 16], new_states).

    The counter in words 12..13 advances by 1 block. Callers that draw many
    blocks per logical step advance by their stride instead (see Csprng).
    """
    cols = [states[:, i] for i in range(16)]
    out = _block(cols, jnp)
    return jnp.stack(out, axis=1)


def step_counter_jnp(states, inc):
    """Advance the 64-bit counter (words 12..13) by ``inc``."""
    c_lo = states[:, 12] + jnp.uint32(inc & 0xFFFFFFFF)
    carry = (c_lo < states[:, 12]).astype(jnp.uint32)
    c_hi = states[:, 13] + jnp.uint32(inc >> 32) + carry
    return states.at[:, 12].set(c_lo).at[:, 13].set(c_hi)


@jax.jit
def chacha20_jnp(states, inc):
    """Generate one keystream block per row and step counters by ``inc``."""
    out = chacha20_block_jnp(states)
    return out, step_counter_jnp(states, inc)


def chacha20_np(states, inc):
    """Host mirror of chacha20_jnp. states: uint32 [rows, 16] (modified copy
    returned). Bit-identical to the device path."""
    states = np.array(states, dtype=np.uint32, copy=True)
    with np.errstate(over="ignore"):
        cols = [states[:, i] for i in range(16)]
        out = np.stack(_block(cols, np), axis=1)
        c_lo = states[:, 12] + np.uint32(inc & 0xFFFFFFFF)
        carry = (c_lo < states[:, 12]).astype(np.uint32)
        states[:, 12] = c_lo
        states[:, 13] = states[:, 13] + np.uint32(inc >> 32) + carry
    return out, states


def make_states(num_rows, key_words, nonce_words, counters) -> np.ndarray:
    """Assemble state rows: constants | key(8) | counter(2) | nonce(2)."""
    states = np.zeros((num_rows, 16), dtype=np.uint32)
    states[:, 0:4] = np.array(CHACHA_CONSTANTS, dtype=np.uint32)
    states[:, 4:12] = np.asarray(key_words, dtype=np.uint32)
    counters = np.asarray(counters, dtype=np.uint64)
    states[:, 12] = (counters & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    states[:, 13] = (counters >> np.uint64(32)).astype(np.uint32)
    states[:, 14:16] = np.asarray(nonce_words, dtype=np.uint32)
    return states
