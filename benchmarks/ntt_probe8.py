"""Fused Pallas MXU transform vs the VPU butterfly kernels (device A/B).

Times the silver-shape (logN=15, level-0 ordinary C) forward and inverse
transforms: the champion phase-split Shoup butterfly kernels
(pallas_ntt) against the VMEM-resident MXU matmul kernels (mxu_pallas).
Device-loop timing: chain K iterations with lax.fori_loop, difference
two chain lengths (docs/DESIGN.md round-3 methodology note).
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

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import mxu_ntt, mxu_pallas, pallas_ntt, u64
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

    d = eng.ntt._mxu_master_tables()
    d = {k: (v if isinstance(v, int) else jnp.asarray(v))
         for k, v in d.items()}
    master = mxu_ntt.plan_from_dict(
        d, jnp.asarray(eng.ntt._ql), jnp.asarray(eng.ntt._qh),
        jnp.asarray(eng.ntt._kl), jnp.asarray(eng.ntt._kh),
        jnp.asarray(eng.ntt._q2))
    mplan = mxu_ntt.take_channels(master, tuple(range(C)))
    mplan = jax.tree_util.tree_map(jnp.asarray, mplan)  # materialize

    variants = {
        "pallas_fwd": lambda x: pallas_ntt.ntt(x, plan),
        "pallas_inv": lambda x: pallas_ntt.intt(x, plan, post_exit=True,
                                                post_reduce=True),
        "mxu_fwd": lambda x: mxu_pallas.ntt(x, mplan),
        "mxu_inv": lambda x: mxu_pallas.intt_no_norm_factor(x, mplan),
        "mxu_xla_fwd": lambda x: mxu_ntt.ntt(x, mplan),
    }

    for name, fn in variants.items():
        try:
            jitted = {}
            for K in (10, 50):
                jitted[K] = jax.jit(
                    lambda x, K=K, fn=fn: lax.fori_loop(
                        0, K, lambda i, v: fn(v), x))
                benchtime.sync(jitted[K](a))
            best = benchtime.diff_time(lambda K: jitted[K](a), 10, 50,
                                       trials=3)
            print(json.dumps({"metric": f"probe8_{name}",
                              "ms": round(best * 1e3, 4),
                              "us_per_ch": round(best * 1e6 / C, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"probe8_{name}",
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
