"""Per-lane-stage probe: which GS lane stage is slow, fwd vs inv."""

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

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import pallas_ntt, u64
    from liberate_tpu.utils import benchtime

    eng = CkksEngine(seed=1, logN=15, scale_bits=40, num_special_primes=2)
    pack = eng.pack(0, -1)
    plan = pack.pallas
    C = int(pack.q2.shape[1])
    N = eng.ctx.N
    rng = np.random.default_rng(5)
    qs = np.array(eng.ctx.q[:C], dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))

    def fwd(l_lo, l_hi):
        kern = functools.partial(
            pallas_ntt._ntt_kernel, logN=plan.logN, signed=False,
            pre_enter=False, post_reduce=False,
            do_rows=False, do_lanes=True, l_lo=l_lo, l_hi=l_hi)
        return lambda x: pallas_ntt._call(kern, x, plan.consts,
                                          plan.row_tw, plan.lane_tw, False)

    def inv(l_lo, l_hi):
        kern = functools.partial(
            pallas_ntt._intt_kernel, logN=plan.logN, signed=False,
            post_exit=False, post_reduce=False, no_norm=True,
            do_rows=False, do_lanes=True, l_lo=l_lo, l_hi=l_hi)
        return lambda x: pallas_ntt._call(kern, x, plan.consts_ninv,
                                          plan.row_itw, plan.lane_itw, False)

    variants = {}
    # transpose-only baseline (zero stages)
    variants["fwd_none"] = fwd(0, 0)
    variants["inv_none"] = inv(0, 0)
    for i in range(pallas_ntt.LANE_STAGES):
        variants[f"fwd_s{i}"] = fwd(i, i + 1)
        variants[f"inv_s{i}"] = inv(i, i + 1)

    import jax.lax as lax

    for name, fn in variants.items():
        # Device-side loop: one dispatch per timing, K kernel iterations
        # chained on device — removes enqueue overhead from the clock
        # (these kernels are tens of microseconds each). Both chain
        # lengths are jitted ONCE and warmed before timing, so no compile
        # lands inside the clock.
        jitted = {}
        for K in (100, 500):
            jitted[K] = jax.jit(
                lambda x, K=K, fn=fn: lax.fori_loop(
                    0, K, lambda i, v: fn(v), x))
            benchtime.sync(jitted[K](a))

        best = benchtime.diff_time(lambda K: jitted[K](a), 100, 500,
                                   trials=3)
        print(json.dumps({"metric": f"probe3_{name}",
                          "us": round(best * 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
