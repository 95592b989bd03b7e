"""Stage-level bisect of the MXU-backend mult failure at silver.

probe13 showed fresh enc/dec and add are correct under
use_mxu_ntt+use_mxu_pallas on hardware but mult is garbage. This runs
the COMPOSED mult path (separate programs: rescale, cc_mult triplet,
relinearize) and decrypt-checks each stage, so the broken stage
identifies itself. All the individual kernels already pass probes
9-12 compiled, so suspicion falls on program composition.

Usage: python benchmarks/ntt_probe14.py [logN]
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
if os.environ.get("JAX_PLATFORMS") == "cpu":
    config.use_pallas = True
    config.pallas_interpret = True


def main():
    import liberate_tpu

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    kw = {} if logN >= 14 else dict(num_scales=6, is_secured=False)
    eng = liberate_tpu.CkksEngine(seed=1, logN=logN, scale_bits=40,
                                  num_special_primes=2, **kw)
    # Force the composed path: each stage is its own program.
    eng._use_fused_mult = lambda: False
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)

    def err(ct, want):
        e = abs(eng.absmax_error(eng.decrode(ct, sk), want))
        return float(e.real) if hasattr(e, "real") else float(e)

    out = {"logN": logN, "path": "composed"}
    trip = eng.cc_mult(ct1, ct2, evk, relin=False)
    e = abs(eng.absmax_error(eng.decryptcode(trip, sk, final_round=True),
                             m1 * m2))
    out["triplet"] = float(e.real) if hasattr(e, "real") else float(e)
    ctm = eng.relinearize(trip, evk)
    out["relin"] = err(ctm, m1 * m2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
