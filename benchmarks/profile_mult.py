"""Device-trace the silver mult with current defaults; print top ops.

Usage: python benchmarks/profile_mult.py [trace_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    import jax
    import numpy as np

    from liberate_tpu.fhe.engine import CkksEngine

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_r3"
    eng = CkksEngine(seed=1, logN=15, scale_bits=40, num_special_primes=2)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m = [eng.example(amin=-1, amax=1) for _ in range(4)]
    cts = [eng.encorypt(x, pk) for x in m]
    acc = None
    for i in range(4):
        o = eng.mult(cts[(2 * i) % 4], cts[(2 * i + 1) % 4], evk)
        acc = o if acc is None else eng.add(acc, o)
    _ = np.asarray(jax.device_get(acc.data[0][0, 0, :1]))
    print("warm done", flush=True)
    jax.profiler.start_trace(trace_dir)
    acc = None
    for i in range(6):
        o = eng.mult(cts[(2 * i) % 4], cts[(2 * i + 1) % 4], evk)
        acc = o if acc is None else eng.add(acc, o)
    _ = np.asarray(jax.device_get(acc.data[0][0, 0, :1]))
    jax.profiler.stop_trace()
    print("trace done", flush=True)


if __name__ == "__main__":
    main()
