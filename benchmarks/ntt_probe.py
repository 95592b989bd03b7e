"""On-device micro-probe: forward vs inverse fused Pallas NTT kernels.

Round-3 profile found the inverse kernel ~3x slower per channel than the
forward (1.8 ms vs 0.62 ms per 19-channel silver transform). This probe
times the kernels in isolation, with the exit-chain variants switched
individually, to locate the slowdown. Prints one JSON line per timing.
"""

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

    variants = {
        "fwd": lambda x: pallas_ntt.ntt(x, plan),
        "fwd_enter": lambda x: pallas_ntt.ntt(x, plan, pre_enter=True),
        "inv_full": lambda x: pallas_ntt.intt(x, plan, post_exit=True,
                                              post_reduce=True),
        "inv_exit": lambda x: pallas_ntt.intt(x, plan, post_exit=True),
        "inv_plain": lambda x: pallas_ntt.intt(x, plan),
        "inv_nonorm": lambda x: pallas_ntt.intt(x, plan, no_norm=True),
    }

    for name, fn in variants.items():
        f = jax.jit(fn)

        def chain(K):
            out = a
            for _ in range(K):
                out = f(out)
            return out

        benchtime.sync(chain(1))
        best = benchtime.diff_time(chain, 10, 50, trials=3)
        print(json.dumps({"metric": f"ntt_probe_{name}",
                          "ms": round(best * 1e3, 4),
                          "us_per_ch": round(best * 1e6 / C, 2),
                          "shape": f"C{C}xN{N}"}), flush=True)


if __name__ == "__main__":
    main()
