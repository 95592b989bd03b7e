"""Measure the cost of the in-kernel [S, R] transposes (MXU kernels).

At logN=14 S == R == 128, so a timing-only kernel variant that SKIPS the
stage-2 transpose (mathematically wrong, shape-legal) isolates what the
two .T relayouts cost per forward transform. Decides whether the
transpose-free k2-major stage-2 redesign is worth building.

Usage: python benchmarks/ntt_probe15.py
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
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import mxu_pallas, u64
    from liberate_tpu.utils import benchtime

    eng = CkksEngine(seed=1, logN=14, scale_bits=40, num_special_primes=1)
    nc = eng.ntt
    C = nc.total_channels
    N = eng.ctx.N
    ref = nc.level_pack(0, -2).mxu
    plan = ref.plan
    S, R = plan.S, plan.R
    assert S == R == 128, (S, R)
    rng = np.random.default_rng(5)
    qs = np.array(eng.ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, N), dtype=np.uint64)
             % (2 * qs[:, None])).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))

    # normal kernel
    f_norm = jax.jit(lambda x: mxu_pallas.ntt(x, plan))

    # hacked kernel: same ops but NO transposes before stage-2 digits
    def _ntt_kernel_not(cref, x_ref, m1_ref, r1_ref, tw_ref, m2_ref,
                        r2_ref, o_ref, *, dA, dB, split):
        c = mxu_pallas._read_consts(cref, 0)
        lo = x_ref[0, 0, 0]
        hi = x_ref[1, 0, 0]
        d = mxu_pallas._digits_k(lo, hi, dB)
        E = mxu_pallas._matmul_s8(m1_ref[0], d) + r1_ref[0]
        b = mxu_pallas._recombine_k(E, c, dA, split, True)
        t = (tw_ref[0, 0], tw_ref[1, 0])
        b = u64.montmul(b, t, c["ql"], c["qh"], c["kl"], c["kh"])
        d2 = mxu_pallas._digits_k(b[0], b[1], dB)      # .T REMOVED
        E2 = mxu_pallas._matmul_s8(m2_ref[0], d2) + r2_ref[0]
        x = mxu_pallas._recombine_k(E2, c, dA, split, True)
        o_ref[0, 0, 0] = x[0]
        o_ref[1, 0, 0] = x[1]

    t1, r1, tw, t2, r2 = mxu_pallas._flat_tables(plan, fwd=True)
    consts = mxu_pallas._consts_from_plan(plan)

    def call_not(x):
        av = x[:, None].reshape(2, 1, C, S, R)
        kern = functools.partial(_ntt_kernel_not, dA=plan.dA, dB=plan.dB,
                                 split=plan.split)
        out = pl.pallas_call(
            kern,
            grid=(C, 1),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((2, 1, 1, S, R), lambda ch, b: (0, b, ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + t1.shape[1:],
                             lambda ch, b: (ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + r1.shape[1:],
                             lambda ch, b: (ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 1) + tw.shape[2:],
                             lambda ch, b: (0, ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + t2.shape[1:],
                             lambda ch, b: (ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1,) + r2.shape[1:],
                             lambda ch, b: (ch, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, 1, 1, R, S),
                                   lambda ch, b: (0, b, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, 1, C, R, S), x.dtype),
        )(consts, av, t1, r1, tw, t2, r2)
        return out.reshape(2, C, N)

    f_not = jax.jit(call_not)

    def bench(f):
        def chain(K):
            out = a
            for _ in range(K):
                out = f(out)
            return out
        benchtime.sync(chain(1))
        return benchtime.diff_time(chain, 10, 50, trials=3)

    t_norm = bench(f_norm)
    t_not = bench(f_not)
    print(json.dumps({
        "metric": "mxu_fwd_transpose_cost_logN14",
        "normal_ms": round(t_norm * 1e3, 4),
        "no_transpose_ms": round(t_not * 1e3, 4),
        "transpose_pct": round(100 * (t_norm - t_not) / t_norm, 1),
        "C": C,
    }), flush=True)


if __name__ == "__main__":
    main()
