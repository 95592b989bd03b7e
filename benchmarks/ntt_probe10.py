"""On-device CORRECTNESS check of the fused MXU key-switch kernel.

probe9 validates the plain mxu_pallas transform kernels on hardware;
this validates ntt_ksk_accum / dispatch_ksk_accum — the fused
transform + ksk-multiply + part-accumulate kernel the engine uses when
use_mxu_ntt + use_mxu_pallas are on — against the XLA composition
(mxu_ntt.ntt + u64.montmul + mod-2q folds) at the silver shape, mod q.

Usage: python benchmarks/ntt_probe10.py [logN [level]]
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
config.use_shoup_ksk = False   # probe the Montgomery-ksk kernel path


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
    sk = eng.create_secret_key()
    evk = eng.create_evk(sk)
    k0st, k1st = eng._ksk_stacked(evk)
    if k0st.ndim == 5:      # engine pre-tiles for the fused switch
        k0f = k0st.reshape(k0st.shape[:3] + (-1,))
        k1f = k1st.reshape(k1st.shape[:3] + (-1,))
    else:
        k0f, k1f = k0st, k1st

    pack_sp = eng.pack(level, -2)
    parts = nc.parts(level)
    part_off = parts[0].part_id
    P = len(parts)
    C_sp = nc.num_channels(level, -2)
    W_sp = nc.padded_channels(level, -2)
    N = eng.ctx.N
    qs = np.array(nc.q_ints(level, -2), dtype=np.uint64)

    rng = np.random.default_rng(7)
    ext_int = (rng.integers(0, 2 ** 62, size=(P, C_sp, N),
                            dtype=np.uint64) % (2 * qs[None, :, None]))
    ext = jnp.asarray(u64.from_int64_np(ext_int.astype(np.int64)))

    # XLA reference: the engine's composed else-branch.
    x = mxu_ntt.ntt(ext, pack_sp.mxu.resolve())
    k0 = ops.fit_channels(k0f[:, part_off:, level:, :], W_sp)
    k1 = ops.fit_channels(k1f[:, part_off:, level:, :], W_sp)
    t0 = ops.mont_mult(x, k0, pack_sp)
    t1 = ops.mont_mult(x, k1, pack_sp)
    w0, w1 = t0[:, 0], t1[:, 0]
    for p in range(1, P):
        w0 = ops.mont_add(w0, t0[:, p], pack_sp)
        w1 = ops.mont_add(w1, t1[:, p], pack_sp)

    # Fused kernel (compiled on hardware, interpret on CPU).
    interp = os.environ.get("JAX_PLATFORMS") == "cpu"
    d0, d1 = mxu_pallas.dispatch_ksk_accum(
        ext, k0st, k1st, pack_sp.mxu, level, part_off, interpret=interp)

    def canon(v):
        x = u64.to_int64_np(np.asarray(v)).astype(np.uint64)
        return x % qs[:, None]

    total = 0
    for name, got, want in (("d0", d0, w0), ("d1", d1, w1)):
        g, w = canon(got), canon(want)
        bad = int((g != w).sum())
        total += bad
        print(json.dumps({"check": f"ksk_accum_{name}", "bad": bad,
                          "of": int(g.size)}), flush=True)
    print(json.dumps({"probe10_total_bad": total, "logN": logN,
                      "level": level, "P": P, "C_sp": C_sp}), flush=True)


if __name__ == "__main__":
    main()
