"""On-device preset smoke: one mult+relin+rescale, correctness-checked.

Usage: python benchmarks/preset_smoke_tpu.py [bronze|silver|gold|platinum]
Prints one JSON line with the execution-synced ms/mult and decrypt error.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

PRESETS = {
    "bronze": dict(logN=14, scale_bits=40, num_special_primes=1),
    "silver": dict(logN=15, scale_bits=40, num_special_primes=2),
    "gold": dict(logN=16, scale_bits=40, num_special_primes=4),
    "platinum": dict(logN=17, scale_bits=40, num_special_primes=6),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "gold"
    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.utils import benchtime

    t0 = time.time()
    eng = CkksEngine(seed=1, **PRESETS[name])
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    ct1 = eng.encorypt(m1, pk)
    ct2 = eng.encorypt(m2, pk)
    print(f"setup {time.time() - t0:.1f}s", flush=True)

    state = {}

    def chain(K):
        acc = None
        for _ in range(K):
            o = eng.mult(ct1, ct2, evk)
            acc = o if acc is None else eng.add(acc, o)
        state["acc"], state["K"] = acc, K
        return acc.data

    benchtime.sync(chain(2))
    print(f"warm (compile) done {time.time() - t0:.1f}s", flush=True)
    best = benchtime.diff_time(chain, 2, 10, trials=2)
    err = abs(eng.absmax_error(eng.decrode(state["acc"], sk),
                               m1 * m2 * state["K"]))
    err = float(err.real) if hasattr(err, "real") else float(err)
    assert err < 1e-3, f"{name}: wrong result, err {err}"
    print(json.dumps({"metric": f"{name}_mult_relin_rescale",
                      "value": round(best * 1000, 3), "unit": "ms",
                      "absmax_error": err}), flush=True)


if __name__ == "__main__":
    main()
