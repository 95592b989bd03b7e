"""VPU ceiling probe: what does a pure montmul chain achieve vs the
butterfly kernels? Decides whether the transform cost is multiply-bound
(op-count work / MXU kernel next) or data-movement-bound (interleaves).

Kernel A: 15 chained full-width montmuls on resident [R, 128] data — the
multiply work of a logN=15 transform with ZERO interleaves/transposes.
Kernel B: 15 chained stage-shaped interleaves with NO multiplies.
Reference: the actual forward transform (split path).
"""

import functools
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
    from liberate_tpu.ntt import pallas_ntt, u64
    from liberate_tpu.utils import benchtime

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

    n_mm = 15

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

    def shuffle_kernel(cref, x_ref, o_ref):
        # 15 stage-shaped interleaves (halve/stack/reshape), no montmuls.
        lo = x_ref[0, 0]
        hi = x_ref[1, 0]
        for s in range(8):
            m = 1 << s
            th = R // (2 * m)
            if th >= 1 and m < 256:
                vl = lo.reshape(m, 2, th * 128)
                vh = hi.reshape(m, 2, th * 128)
                e = (vl[:, 0], vh[:, 0])
                o = (vl[:, 1], vh[:, 1])
                s2 = u64.add(e, o)
                d2 = u64.sub(e, o)
                lo = jnp.stack([s2[0], d2[0]], axis=1).reshape(R, 128)
                hi = jnp.stack([s2[1], d2[1]], axis=1).reshape(R, 128)
        lo = lo.T
        hi = hi.T
        for k in (1, 2, 4, 8, 16, 32, 64):
            t = 128 // (2 * k)
            vl = lo.reshape(k, 2, t, R)
            vh = hi.reshape(k, 2, t, R)
            e = (vl[:, 0], vh[:, 0])
            o = (vl[:, 1], vh[:, 1])
            s2 = u64.add(e, o)
            d2 = u64.sub(e, o)
            lo = jnp.stack([s2[0], d2[0]], axis=1).reshape(128, R)
            hi = jnp.stack([s2[1], d2[1]], axis=1).reshape(128, R)
        o_ref[0, 0] = lo.T
        o_ref[1, 0] = hi.T

    av = a.reshape(2, C, R, 128)

    def call(kern):
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
        )(plan.consts_enter, av).reshape(2, C, N)

    variants = {
        "mm15": lambda x: call(mm_kernel),
        "shuffle15": lambda x: call(shuffle_kernel),
        "fwd": lambda x: pallas_ntt.ntt(x, plan),
    }

    for name, fn in variants.items():
        jitted = {}
        for K in (20, 100):
            jitted[K] = jax.jit(
                lambda x, K=K, fn=fn: lax.fori_loop(
                    0, K, lambda i, v: fn(v), x))
            benchtime.sync(jitted[K](a))
        best = benchtime.diff_time(lambda K: jitted[K](a), 20, 100, trials=3)
        print(json.dumps({"metric": f"probe5_{name}",
                          "ms": round(best * 1e3, 4),
                          "us_per_ch": round(best * 1e6 / C, 2)}), flush=True)


if __name__ == "__main__":
    main()
