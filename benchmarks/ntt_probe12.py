"""On-device check of BATCHED fused MXU kernel dispatch.

The engine's hot path runs the MXU kernels on batched stacks
([2, B, C, N]: B=4 in _cc_mult_core, B=3 in _relin_pre); probe9/11 only
cover B=1 compiled. This compares batched mxu_pallas.dispatch (grid
(C, B), batch-fastest block maps) against the XLA composition, mod q.

Usage: python benchmarks/ntt_probe12.py [logN [level]]
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
    pack = eng.pack(level, -1)     # ordinary pack, like _cc_mult_core
    ref = pack.mxu
    res = ref.resolve()
    C = nc.num_channels(level, -1)
    N = eng.ctx.N
    qs = np.array(nc.q_ints(level, -1), dtype=np.uint64)

    rng = np.random.default_rng(17)
    interp = os.environ.get("JAX_PLATFORMS") == "cpu"

    def canon(v):
        x = u64.to_int64_np(np.asarray(v)).astype(np.uint64)
        return x % qs[None, :, None]

    total = 0

    def check(name, got, want):
        nonlocal total
        g, w = canon(got), canon(want)
        bad = int((g != w).sum())
        total += bad
        print(json.dumps({"check": name, "bad": bad, "of": int(g.size)}),
              flush=True)

    for B in (3, 4):
        a_int = (rng.integers(0, 2 ** 62, size=(B, C, N), dtype=np.uint64)
                 % (2 * qs[None, :, None]))
        a = jnp.asarray(u64.from_int64_np(a_int.astype(np.int64)))

        want_e = mxu_ntt.ntt(ops.mont_enter(a, pack), res)
        check(f"b{B}_enter_fwd",
              mxu_pallas.dispatch(a, ref, enter=True, interpret=interp),
              want_e)
        y = mxu_ntt.ntt(a, res)
        want_i = mxu_ntt.intt_no_norm_factor(y, res)
        check(f"b{B}_inv_exitx_reduce",
              mxu_pallas.dispatch(y, ref, inverse=True, exitx=True,
                                  post_reduce=True, interpret=interp),
              ops.reduce_2q(ops.mont_redc(want_i, pack), pack))

    print(json.dumps({"probe12_total_bad": total, "logN": logN,
                      "level": level, "C": C}), flush=True)


if __name__ == "__main__":
    main()
