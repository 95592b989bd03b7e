"""Discrete Gaussian sampling via 128-bit CDT inversion.

Builds the cumulative distribution table for sigma=3.2 over the half plane
with tau = 2^ceil(log2(6*sigma)) sampling points, at 128-bit precision
(mpmath, 256-bit intermediate precision), exactly as the reference
(reference: src/liberate/csprng/discrete_gaussian_sampler.py:12-114).

Sampling walks the CDT as a 1-D expanded binary search tree in constant
time (depth steps); the sign comes from one reserved random bit. Each
sample consumes 128 random bits.
"""

import math

import mpmath as mpm
import numpy as np


def build_CDT_binary_search_tree(security_bits=128, sigma=3.2):
    """Returns (btree_u32, btree_np64, tree_depth).

    btree_u32: uint32 [4, num_nodes] — limbs (lo0, lo1, hi0, hi1) of each
    node's 128-bit CDT value, ready for limb-wise comparison on device.
    btree_np64: uint64 [num_nodes, 2] — (low64, high64), the reference's
    layout, used by the host golden sampler.
    """
    mpm.mp.prec = security_bits * 2

    sampling_power = math.ceil(math.log2(6 * sigma))
    num_sampling_points = 2 ** sampling_power

    # Gaussian weights over the half plane at 256-bit working precision:
    # P(x) ∝ exp(-x²/2σ²)/(σ√2π), with the x=0 weight halved (it is
    # shared between the two half planes). The running sums are then
    # fixed-point scaled to 2^security_bits integers.
    sig = mpm.mpf(str(sigma))
    two = mpm.mpf("2")
    norm = sig * mpm.sqrt(two * mpm.pi)
    weights = [mpm.exp(-mpm.mpf(str(x)) ** 2 / (two * sig ** 2)) / norm
               for x in range(num_sampling_points)]
    weights[0] /= 2

    cdf = [mpm.mpf(0)]
    for wt in weights:
        cdf.append(cdf[-1] + wt)
    scale = two ** mpm.mpf(str(security_bits))
    CDT = [int(c * scale) for c in cdf]

    # Expanded binary tree over the CDT (layer by layer; node k of layer d
    # indexes CDT entry (2k+1) * tau / 2^(d+1)).
    tree_depth = sampling_power
    order = []
    for depth in range(tree_depth):
        num_nodes = 2 ** depth
        step = num_sampling_points // num_nodes
        first = step // 2
        order += list(range(first, num_sampling_points, step))

    mask64 = (1 << 64) - 1
    lo64 = np.array([CDT[i] & mask64 for i in order], dtype=np.uint64)
    hi64 = np.array([CDT[i] >> 64 for i in order], dtype=np.uint64)
    btree_np64 = np.stack([lo64, hi64], axis=1)

    btree_u32 = np.stack([
        (lo64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (lo64 >> np.uint64(32)).astype(np.uint32),
        (hi64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (hi64 >> np.uint64(32)).astype(np.uint32),
    ], axis=0)
    return btree_u32, btree_np64, tree_depth


def sample_from_words_np(words, btree_np64, depth):
    """Host golden sampler. words: uint32 [..., 4k] -> int64 samples [..., k].

    Word-to-sample mapping mirrors the reference kernel
    (reference: discrete_gaussian_cuda_kernel.cu:62-105): for each group of
    4 words, x_low = (w0<<32)|w1, x_high = (w2<<32)|w3; the sign is the LSB
    of x_high, which is then shifted right once (127-bit magnitude).
    """
    w = np.asarray(words, dtype=np.uint64)
    shape = w.shape[:-1] + (w.shape[-1] // 4, 4)
    w = w.reshape(shape)
    x_low = (w[..., 0] << np.uint64(32)) | w[..., 1]
    x_high = (w[..., 2] << np.uint64(32)) | w[..., 3]
    sign_bit = (x_high & np.uint64(1)).astype(np.int64)
    x_high = x_high >> np.uint64(1)

    current = np.zeros(x_low.shape, dtype=np.int64)
    counter = 0
    jump = 1
    for _ in range(depth):
        node = counter + current
        y_low = btree_np64[node, 0]
        y_high = btree_np64[node, 1]
        ge = (x_high > y_high) | ((x_high == y_high) & (x_low >= y_low))
        current = 2 * current + ge.astype(np.int64)
        counter += jump
        jump *= 2
    return (sign_bit * 2 - 1) * current
