"""On-device A/B of the phase-split transforms + masked-roll lane stages.

Compares the round-3 split paths (config.use_split_transform /
use_split_switch, SMALL_T masked-roll stages) against the round-2 fused
kernels, at the silver shape. Device-side fori_loop chains (see
ntt_probe3) keep enqueue overhead out of the clock.
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

    from liberate_tpu import config
    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import pallas_ntt, u64
    from liberate_tpu.utils import benchtime

    mode = sys.argv[1] if len(sys.argv) > 1 else "split"
    if mode.startswith("fused"):
        config.use_split_transform = False
        config.use_split_switch = False
    if mode.endswith("0"):
        # Disable the masked-roll small-t stages (round-2 sliced forms).
        pallas_ntt.SMALL_T = 0
    elif mode.endswith("128"):
        # Masked-roll for ALL lane stages (no sublane slicing at all).
        pallas_ntt.SMALL_T = 128

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
        "inv_plain": lambda x: pallas_ntt.intt(x, plan),
    }

    for name, fn in variants.items():
        jitted = {}
        for K in (20, 100):
            jitted[K] = jax.jit(
                lambda x, K=K, fn=fn: lax.fori_loop(
                    0, K, lambda i, v: fn(v), x))
            benchtime.sync(jitted[K](a))
        best = benchtime.diff_time(lambda K: jitted[K](a), 20, 100, trials=3)
        print(json.dumps({"metric": f"probe4_{mode}_{name}",
                          "ms": round(best * 1e3, 4),
                          "us_per_ch": round(best * 1e6 / C, 2)}), flush=True)


if __name__ == "__main__":
    main()
