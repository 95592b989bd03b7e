"""On-device CORRECTNESS check of the MXU enter/exit-folded variants.

probe9 covers the plain fused MXU kernels on hardware; this covers the
folded-table variants the engine's hot path uses (enter_ntt /
intt_exit[_reduce] / intt_reduce): mxu_pallas.dispatch with
enter/exitx/post_reduce against the mxu_ntt XLA composition, mod q.

Usage: python benchmarks/ntt_probe11.py [logN [level]]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

from liberate_tpu import config

config.use_mxu_ntt = True
config.use_mxu_pallas = True


def main():
    import jax.numpy as jnp

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import mxu_ntt, mxu_pallas, ops, u64

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    level = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    kw = {} if logN >= 14 else dict(num_scales=6, is_secured=False)
    eng = CkksEngine(seed=1, logN=logN, scale_bits=40,
                     num_special_primes=2, **kw)
    nc = eng.ntt
    pack = eng.pack(level, -2)
    ref = pack.mxu
    res = ref.resolve()
    C = nc.num_channels(level, -2)
    N = eng.ctx.N
    qs = np.array(nc.q_ints(level, -2), dtype=np.uint64)

    rng = np.random.default_rng(11)
    a_int = (rng.integers(0, 2 ** 62, size=(C, N), dtype=np.uint64)
             % (2 * qs[:, None]))
    a = jnp.asarray(u64.from_int64_np(a_int.astype(np.int64)))

    interp = os.environ.get("JAX_PLATFORMS") == "cpu"

    def canon(v):
        x = u64.to_int64_np(np.asarray(v)).astype(np.uint64)
        return x % qs[:, None]

    total = 0

    def check(name, got, want):
        nonlocal total
        g, w = canon(got), canon(want)
        bad = int((g != w).sum())
        total += bad
        print(json.dumps({"check": name, "bad": bad, "of": int(g.size)}),
              flush=True)

    # enter-folded forward: transform of a*R
    want_e = mxu_ntt.ntt(ops.mont_enter(a, pack), res)
    check("enter_fwd",
          mxu_pallas.dispatch(a, ref, enter=True, interpret=interp), want_e)

    y = mxu_ntt.ntt(a, res)
    want_i = mxu_ntt.intt_no_norm_factor(y, res)
    # exit-folded inverse: iNTT then Montgomery exit
    check("inv_exitx",
          mxu_pallas.dispatch(y, ref, inverse=True, exitx=True,
                              interpret=interp),
          ops.mont_redc(want_i, pack))
    # exit + reduce
    check("inv_exitx_reduce",
          mxu_pallas.dispatch(y, ref, inverse=True, exitx=True,
                              post_reduce=True, interpret=interp),
          ops.reduce_2q(ops.mont_redc(want_i, pack), pack))
    # plain reduce (Shoup switch tail)
    check("inv_reduce",
          mxu_pallas.dispatch(y, ref, inverse=True, post_reduce=True,
                              interpret=interp),
          ops.reduce_2q(want_i, pack))

    print(json.dumps({"probe11_total_bad": total, "logN": logN,
                      "level": level, "C": C}), flush=True)


if __name__ == "__main__":
    main()
