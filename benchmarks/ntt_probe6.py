"""Shoup constant-multiply vs Montgomery multiply: VPU chain timing.

Shoup: for a CONSTANT w < q with precomputed w' = floor(w * 2^64 / q),
    hi = mulhi64(w', x);  r = (w*x - hi*q) mod 2^64;  r in [0, 2q).
Cheaper than Montgomery REDC for the twiddle multiplies (the butterfly's
only multiplies): ~36 16-bit muls + short carry chains vs ~44 + long
chains. Times a 15-deep chain of each on resident [R, 128] data.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import jax
    import jax.lax as lax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import u64
    from liberate_tpu.utils import benchtime

    U32 = jnp.uint32

    eng = CkksEngine(seed=1, logN=15, scale_bits=40, num_special_primes=2)
    pack = eng.pack(0, -1)
    plan = pack.pallas
    C = int(pack.q2.shape[1])
    N = eng.ctx.N
    R = N // 128
    rng = np.random.default_rng(5)
    qs = np.array(eng.ctx.q[:C], dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))

    # Shoup constants per channel: w = psi (any constant < q), and the
    # full-q pair for the subtraction. Rows: w_lo w_hi wp_lo wp_hi q_lo q_hi.
    ws = np.array([int(q) - 12345 for q in qs], dtype=np.uint64)
    wps = np.array([(int(w) << 64) // int(q) for w, q in zip(ws, qs)],
                   dtype=object)
    sc = np.zeros((6, C), dtype=np.uint32)
    sc[0] = (ws & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sc[1] = (ws >> np.uint64(32)).astype(np.uint32)
    sc[2] = np.array([int(w) & 0xFFFFFFFF for w in wps], dtype=np.uint32)
    sc[3] = np.array([(int(w) >> 32) & 0xFFFFFFFF for w in wps],
                     dtype=np.uint32)
    sc[4] = (qs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sc[5] = (qs >> np.uint64(32)).astype(np.uint32)
    sc = jnp.asarray(sc)

    n_mm = 15

    def mulhi64(a, b):
        """Upper 64 bits of u64*u64 (b constant pair)."""
        alo, ahi = a
        blo, bhi = b
        ll = u64.mul32_wide(alo, blo)
        lh = u64.mul32_wide(alo, bhi)
        hl = u64.mul32_wide(ahi, blo)
        hh = u64.mul32_wide(ahi, bhi)
        # carry = ((ll>>32) + lh_lo + hl_lo) >> 32
        mid = u64.add(u64.add((ll[1], jnp.zeros_like(ll[1])),
                              (lh[0], jnp.zeros_like(lh[0]))),
                      (hl[0], jnp.zeros_like(hl[0])))
        hi = u64.add(hh, (lh[1], jnp.zeros_like(lh[1])))
        hi = u64.add(hi, (hl[1], jnp.zeros_like(hl[1])))
        hi = u64.add(hi, (mid[1], jnp.zeros_like(mid[1])))
        return hi

    def mullo64(a, b):
        alo, ahi = a
        blo, bhi = b
        ll = u64.mul32_wide(alo, blo)
        return (ll[0], ll[1] + alo * bhi + ahi * blo)

    def shoup_kernel(cref, x_ref, o_ref):
        ch = pl.program_id(0)
        w = (cref[0, ch], cref[1, ch])
        wp = (cref[2, ch], cref[3, ch])
        q = (cref[4, ch], cref[5, ch])
        lo = x_ref[0, 0]
        hi = x_ref[1, 0]
        for _ in range(n_mm):
            x = (lo, hi)
            hi_est = mulhi64(x, wp)
            r = u64.sub(mullo64(x, w), mullo64(hi_est, q))
            lo, hi = r
        o_ref[0, 0] = lo
        o_ref[1, 0] = hi

    def mm_kernel(cref, x_ref, o_ref):
        ch = pl.program_id(0)
        ql, qh = cref[0, ch], cref[1, ch]
        kl, kh = cref[2, ch], cref[3, ch]
        S = (cref[6, ch], cref[7, ch])
        lo = x_ref[0, 0]
        hi = x_ref[1, 0]
        for _ in range(n_mm):
            lo, hi = u64.montmul((lo, hi), S, ql, qh, kl, kh)
        o_ref[0, 0] = lo
        o_ref[1, 0] = hi

    av = a.reshape(2, C, R, 128)

    def call(kern, consts):
        return pl.pallas_call(
            kern,
            grid=(C,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 1, R, 128), lambda c: (0, c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, 1, R, 128), lambda c: (0, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, C, R, 128), a.dtype),
        )(consts, av).reshape(2, C, N)

    variants = {
        "mont15": lambda x: call(mm_kernel, plan.consts_enter),
        "shoup15": lambda x: call(shoup_kernel, sc),
    }

    for name, fn in variants.items():
        jitted = {}
        for K in (20, 100):
            jitted[K] = jax.jit(
                lambda x, K=K, fn=fn: lax.fori_loop(
                    0, K, lambda i, v: fn(v), x))
            benchtime.sync(jitted[K](a))
        best = benchtime.diff_time(lambda K: jitted[K](a), 20, 100, trials=3)
        print(json.dumps({"metric": f"probe6_{name}",
                          "ms": round(best * 1e3, 4),
                          "us_per_ch": round(best * 1e6 / C, 2)}), flush=True)


if __name__ == "__main__":
    main()
