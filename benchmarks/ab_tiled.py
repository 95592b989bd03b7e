"""On-device A/B of the tiled-pointwise config flags (one config per run).

Usage: python benchmarks/ab_tiled.py <config>
  config in {base, moddown, rescale, extend, all}

Runs the silver (logN=15) mult+relin+rescale headline under the chosen
flag set and prints one JSON line with the honest (execution-synced,
length-differenced) seconds/mult plus the decrypt error of the
homomorphically accumulated result, so a wrong fast path fails loudly.

Each config runs in its OWN process: the flags are read at trace time
and the engine caches jitted programs, so in-process flag flips could
reuse stale traces. The persistent XLA compile cache makes repeat runs
cheap.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from liberate_tpu import config  # noqa: E402

CONFIGS = {
    # "base" pins the classic Pallas-VPU backend (use_mxu_ntt defaults
    # to auto=ON on TPU since round 5, so the A/B needs the explicit
    # False); "default" measures whatever the current defaults resolve
    # to.
    "base": {"use_mxu_ntt": False},
    "default": {},
    "moddown": {"use_tiled_moddown": True},
    "rescale": {"use_tiled_rescale": True},
    "extend": {"use_tiled_extend": True},
    "all": {"use_tiled_moddown": True, "use_tiled_rescale": True,
            "use_tiled_extend": True},
    # MXU matmul NTT backend. "mxu": the round-2 XLA einsum composition;
    # "mxu_pl": the VMEM-resident fused Pallas MXU kernels incl. the
    # fused switch (config.use_mxu_pallas, round 4).
    "mxu": {"use_mxu_ntt": True, "use_mxu_pallas": False},
    "mxu_all": {"use_mxu_ntt": True, "use_mxu_pallas": False,
                "use_tiled_moddown": True,
                "use_tiled_rescale": True, "use_tiled_extend": True},
    "mxu_pl": {"use_mxu_ntt": True, "use_mxu_pallas": True},
    # Shoup-form pointwise chains OFF (round-4 A/B; they default on).
    "noshoupchains": {"use_shoup_moddown": False, "use_shoup_rescale": False,
                      "use_shoup_extend": False},
    # Montgomery ksk in the fused MXU switch (round-5 A/B).
    "noshoupksk": {"use_shoup_ksk": False},
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    for k, v in CONFIGS[name].items():
        setattr(config, k, v)

    import liberate_tpu
    from liberate_tpu.utils import benchtime

    eng = liberate_tpu.CkksEngine(seed=1, logN=15, scale_bits=40,
                                  num_special_primes=2)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)
    m1 = eng.example(amin=-1, amax=1)
    m2 = eng.example(amin=-1, amax=1)
    cts = [eng.encorypt(m1, pk), eng.encorypt(m2, pk)]

    state = {}

    def chain(K):
        acc = None
        for i in range(K):
            o = eng.mult(cts[0], cts[1], evk)
            acc = o if acc is None else eng.add(acc, o)
        state["acc"], state["K"] = acc, K
        return acc.data

    # Warm up with K=2, not K=1: chain(1) never calls eng.add (the
    # accumulator short-circuits), so a K=1 warmup leaves the add program
    # to compile INSIDE the timed region — the differenced time then goes
    # negative (t(k1) includes a remote compile, t(k2) doesn't).
    benchtime.sync(chain(2))
    iters = 40
    best = benchtime.diff_time(chain, max(2, iters // 4), iters, trials=3)
    assert best > 0, f"A/B config {name}: non-positive diff time {best}"
    err = abs(eng.absmax_error(eng.decrode(state["acc"], sk),
                               m1 * m2 * state["K"]))
    err = float(err.real) if hasattr(err, "real") else float(err)
    assert err < 1e-3, f"A/B config {name}: wrong result, err {err}"
    print(json.dumps({"metric": f"silver_mult_tiled_ab_{name}",
                      "value": round(best * 1000, 3), "unit": "ms",
                      "absmax_error": err}), flush=True)


if __name__ == "__main__":
    main()
