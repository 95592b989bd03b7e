"""On-device CORRECTNESS check of the fused Pallas MXU kernels.

Interpret mode validates the math; this validates the Mosaic lowering on
real hardware: mxu_pallas (compiled) vs mxu_ntt (XLA) mod q, for the
plain kernels (both recombination modes), block-offset indexing, the
width-group dispatch, and the fused switch kernel.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    import jax.numpy as jnp

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.ntt import mxu_ntt, mxu_pallas, u64

    eng = CkksEngine(seed=1, logN=15, scale_bits=40, num_special_primes=2)
    nc = eng.ntt
    C0 = nc.total_channels
    N = eng.ctx.N
    rng = np.random.default_rng(5)
    qs = np.array(eng.ctx.q, dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C0, N), dtype=np.uint64)
             % (2 * qs[:, None])).astype(np.int64)
    a = jnp.asarray(u64.from_int64_np(a_int))

    d = nc._mxu_master_tables()
    d = {k: (v if isinstance(v, int) else jnp.asarray(v))
         for k, v in d.items()}
    master = mxu_ntt.plan_from_dict(
        d, jnp.asarray(nc._ql), jnp.asarray(nc._qh),
        jnp.asarray(nc._kl), jnp.asarray(nc._kh), jnp.asarray(nc._q2))
    groups = nc._mxu_group_plans()
    ref = mxu_ntt.MxuRef(master, tuple(range(C0)), groups=groups)

    def canon(x, q_lo=0):
        v = u64.to_int64_np(np.asarray(x)).astype(np.uint64)
        return v % qs[q_lo: q_lo + v.shape[-2], None]

    def check(name, got, want, q_lo=0):
        g, w = canon(got, q_lo), canon(want, q_lo)
        bad = int((g != w).sum())
        print(json.dumps({"check": name, "bad": bad, "of": int(g.size)}),
              flush=True)
        return bad

    total = 0
    want_f = mxu_ntt.ntt(a, master)
    total += check("fwd_mont", mxu_pallas.ntt(a, master, shoup_rec=False),
                   want_f)
    total += check("fwd_shoup", mxu_pallas.ntt(a, master), want_f)
    want_i = mxu_ntt.intt_no_norm_factor(want_f, master)
    total += check("inv_shoup",
                   mxu_pallas.intt_no_norm_factor(want_f, master), want_i)
    total += check("fwd_groups", mxu_pallas.dispatch(a, ref), want_f)
    total += check("inv_groups",
                   mxu_pallas.dispatch(want_f, ref, inverse=True), want_i)
    # offset indexing (level-5 suffix)
    off = 5
    total += check("fwd_off",
                   mxu_pallas.ntt(a[:, off:], master, ch_off=off),
                   mxu_ntt.ntt(a[:, off:],
                               mxu_ntt.take_channels(
                                   master, tuple(range(off, C0)))),
                   q_lo=off)
    # group dispatch with a nonzero start (level-5 layout)
    ref5 = mxu_ntt.MxuRef(master, tuple(range(off, C0)), groups=groups)
    total += check("fwd_groups_off", mxu_pallas.dispatch(a[:, off:], ref5),
                   mxu_ntt.ntt(a[:, off:],
                               mxu_ntt.take_channels(
                                   master, tuple(range(off, C0)))),
                   q_lo=off)
    print(json.dumps({"probe9_total_bad": total}), flush=True)


if __name__ == "__main__":
    main()
