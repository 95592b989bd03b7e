"""Phase-split probe with device-loop timing (post-Shoup): where does
the inverse transform's remaining 2.2x-vs-forward cost live?"""

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

    def fwd_part(do_rows, do_lanes):
        kern = functools.partial(
            pallas_ntt._ntt_kernel, logN=plan.logN, signed=False,
            pre_enter=False, post_reduce=False,
            do_rows=do_rows, do_lanes=do_lanes)
        return lambda x: pallas_ntt._call(kern, x, plan.consts,
                                          plan.row_tw, plan.lane_tw, False)

    def inv_part(do_rows, do_lanes):
        kern = functools.partial(
            pallas_ntt._intt_kernel, logN=plan.logN, signed=False,
            post_exit=False, post_reduce=False,
            do_rows=do_rows, do_lanes=do_lanes, no_norm=True)
        return lambda x: pallas_ntt._call(kern, x, plan.consts_ninv,
                                          plan.row_itw, plan.lane_itw, False)

    def inv_lane_group(l_lo, l_hi):
        kern = functools.partial(
            pallas_ntt._intt_kernel, logN=plan.logN, signed=False,
            post_exit=False, post_reduce=False,
            do_rows=False, do_lanes=True, no_norm=True,
            l_lo=l_lo, l_hi=l_hi)
        return lambda x: pallas_ntt._call(kern, x, plan.consts_ninv,
                                          plan.row_itw, plan.lane_itw, False)

    variants = {
        "fwd_rows": fwd_part(True, False),
        "fwd_lanes": fwd_part(False, True),
        "inv_rows": inv_part(True, False),
        "inv_lanes": inv_part(False, True),
        # inverse lane stages in two kernels: masked-roll group (t=1,2,4
        # = i 4..6) and sliced group (t=8..64 = i 0..3)
        "inv_lanes_masked": inv_lane_group(4, 7),
        "inv_lanes_sliced": inv_lane_group(0, 4),
    }

    for name, fn in variants.items():
        jitted = {}
        for K in (20, 100):
            jitted[K] = jax.jit(
                lambda x, K=K, fn=fn: lax.fori_loop(
                    0, K, lambda i, v: fn(v), x))
            benchtime.sync(jitted[K](a))
        best = benchtime.diff_time(lambda K: jitted[K](a), 20, 100, trials=3)
        print(json.dumps({"metric": f"probe7_{name}",
                          "ms": round(best * 1e3, 4),
                          "us_per_ch": round(best * 1e6 / C, 2)}), flush=True)


if __name__ == "__main__":
    main()
