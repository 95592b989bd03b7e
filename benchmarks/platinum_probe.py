"""Probe: platinum (logN=17) on the Pallas path, with compile retries.

Round-1 finding: individual logN=17 kernels are bit-exact, but compiling
full-width engine pipelines crashes the environment's remote TPU compile
helper NON-deterministically (HTTP 500). This probe (a) confirms whether
the process survives the failure, (b) measures whether retrying the same
compile succeeds, and (c) finds a slab size that compiles reliably.

Run on the real TPU:  python benchmarks/platinum_probe.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from liberate_tpu import config
    from liberate_tpu.ntt import ntt_context

    print("backend:", jax.default_backend(), flush=True)

    # Raise the Pallas gate to logN=17 for this probe.
    orig = ntt_context.NttContext._maybe_pallas_plan

    def patched(self, idx):
        from liberate_tpu.ntt import pallas_ntt
        if not (8 <= self.logN <= 17):
            return None
        ctx = self.ctx
        psi_u64 = (self._psi_mont[0, idx].astype(np.uint64)
                   | (self._psi_mont[1, idx].astype(np.uint64) << 32))
        ipsi_u64 = (self._ipsi_mont[0, idx].astype(np.uint64)
                    | (self._ipsi_mont[1, idx].astype(np.uint64) << 32))
        return pallas_ntt.make_plan(
            self.logN, [ctx.q[i] for i in idx], [ctx.k[i] for i in idx],
            [ctx.R_square[i] for i in idx],
            [(ctx.N_inv[i] * ctx.R) % ctx.q[i] for i in idx],
            psi_u64, ipsi_u64)

    ntt_context.NttContext._maybe_pallas_plan = patched
    config.use_pallas = True

    from liberate_tpu.fhe.engine import CkksEngine

    t0 = time.time()
    eng = CkksEngine(logN=17, scale_bits=40, num_special_primes=6,
                     is_secured=False, seed=1)
    print(f"engine built in {time.time()-t0:.1f}s; "
          f"num_scales={eng.ctx.num_scales}, C0_sp={len(eng.ctx.q)}",
          flush=True)

    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    m = eng.example(amin=-1, amax=1)

    for attempt in range(1, 6):
        try:
            t0 = time.time()
            ct = eng.encorypt(m, pk)
            jax.block_until_ready(ct.data)
            print(f"encorypt OK on attempt {attempt} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            break
        except Exception as e:
            print(f"encorypt attempt {attempt} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            traceback.print_exc(limit=2)
            time.sleep(2)
    else:
        print("encorypt never compiled; aborting", flush=True)
        return

    evk = eng.create_evk(sk)
    ct2 = eng.encorypt(m, pk)
    for attempt in range(1, 6):
        try:
            t0 = time.time()
            out = eng.mult(ct, ct2, evk)
            jax.block_until_ready(out.data)
            print(f"mult compile+run OK on attempt {attempt} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            break
        except Exception as e:
            print(f"mult attempt {attempt} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            traceback.print_exc(limit=2)
            time.sleep(2)
    else:
        print("mult never compiled", flush=True)
        return

    # Timed steady-state (before any d2h! axon quirk).
    for _ in range(3):
        out = eng.mult(ct, ct2, evk)
    jax.block_until_ready(out.data)
    t0 = time.time()
    n = 20
    for _ in range(n):
        out = eng.mult(ct, ct2, evk)
    jax.block_until_ready(out.data)
    dt = (time.time() - t0) / n
    print(f"platinum mult+relin+rescale: {dt*1e3:.2f} ms "
          f"({1/dt:.0f} mult/s)", flush=True)

    dec = eng.decrode(out, sk)
    err = abs(eng.absmax_error(dec, m * m))
    print(f"decrypt err: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
