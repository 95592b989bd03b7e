"""Scaling-efficiency benchmark scaffold (BASELINE.md config 4/5).

Measures correctness-coupled mult throughput on 1 device and on an
n-device RNS-sharded mesh, reporting scaling efficiency
eff = (T_1 / T_n) / n. On real multi-chip hardware this produces the
BASELINE ">= 80% to 2 hosts" metric; on the virtual CPU mesh it validates
the measurement path only (virtual devices share one core, so efficiency
is meaningless there — the JSON marks the backend).

Usage: python benchmarks/scaling.py [n_devices]
"""

import json
import os
import sys


sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def _mult_throughput(eng, cts, evk, iters):
    from liberate_tpu.utils import benchtime

    def chain(K):
        acc = None
        for i in range(K):
            a, b = cts[(2 * i) % len(cts)], cts[(2 * i + 1) % len(cts)]
            o = eng.mult(a, b, evk)
            acc = o if acc is None else eng.add(acc, o)
        return acc.data

    benchtime.sync(chain(1))
    return benchtime.diff_time(chain, max(1, iters // 4), iters, trials=2)


def main():
    import jax

    from liberate_tpu.fhe.engine import CkksEngine
    from liberate_tpu.parallel import make_mesh

    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        params = dict(logN=15, scale_bits=40, num_special_primes=2, seed=1)
        iters = 16
    else:
        params = dict(logN=8, scale_bits=30, num_scales=3,
                      num_special_primes=2, is_secured=False, seed=1)
        iters = 2

    def build(mesh):
        eng = CkksEngine(mesh=mesh, **params)
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        evk = eng.create_evk(sk)
        cts = [eng.encorypt(eng.example(amin=-1, amax=1), pk)
               for _ in range(4)]
        return eng, cts, evk

    eng1, cts1, evk1 = build(None)
    t1 = _mult_throughput(eng1, cts1, evk1, iters)

    result = {"metric": "mult_scaling_efficiency",
              "backend": jax.devices()[0].platform,
              "t_1dev_ms": round(t1 * 1e3, 4)}
    if n > 1 and len(jax.devices()) >= n:
        engn, ctsn, evkn = build(make_mesh(n))
        tn = _mult_throughput(engn, ctsn, evkn, iters)
        result.update({
            "n_devices": n,
            "t_ndev_ms": round(tn * 1e3, 4),
            "efficiency_pct": round(100.0 * t1 / (tn * n), 1),
            "speedup": round(t1 / tn, 2),
        })
        if result["backend"] != "tpu":
            result["note"] = ("virtual CPU mesh: devices share host cores; "
                              "efficiency is not meaningful off-TPU")
    else:
        result["note"] = f"only {len(jax.devices())} device(s); sharded leg skipped"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
