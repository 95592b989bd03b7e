"""Benchmark: ct-ct multiply + relinearize + rescale throughput.

The headline benchmark from BASELINE.md: silver-preset (logN=15,
2 special primes) ciphertext-ciphertext multiplication including
relinearization (hybrid key switching) and rescale — the hot loop of any
CKKS workload (reference: ckks_engine.py:1072-1151).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers and no A100 is reachable here, so
vs_baseline divides by 1000 mult/s — a deliberately GENEROUS estimate of
an A100 running a state-of-the-art GPU CKKS stack at logN=15 (public GPU
CKKS libraries report ~1-3 ms per mult+relin+rescale at this size; see
BASELINE.md "vs_baseline derivation").
"""

import json
import os
import sys
import time

# Keep the benchmark shape manageable on whatever backend is present;
# fall back to CPU if no accelerator is available. The accelerator probe
# runs in a SUBPROCESS with a timeout: on the tunneled dev runtime a dead
# tunnel makes jax.devices() hang forever rather than raise, which would
# hang the whole benchmark. The shell may preset JAX_PLATFORMS to the
# accelerator platform (e.g. "axon"), so probe unless CPU was explicitly
# requested.
if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=180, text=True)
        if "ok" not in probe.stdout:
            os.environ["JAX_PLATFORMS"] = "cpu"
    except Exception:
        os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env var alone can be read too early (sitecustomize imports jax at
# interpreter start); pin the platform explicitly so a CPU run can never
# touch the TPU tunnel.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from liberate_tpu.fhe.engine import CkksEngine  # noqa: E402


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        params = dict(logN=15, scale_bits=40, num_special_primes=2)
    else:
        # CPU smoke configuration: the emulated-u64 path is ~1000x slower
        # than a real chip; keep the benchmark runnable everywhere.
        params = dict(logN=10, scale_bits=40, num_scales=4,
                      num_special_primes=2, is_secured=False)

    eng = CkksEngine(seed=1, **params)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    evk = eng.create_evk(sk)

    from liberate_tpu.utils import benchtime

    n_ct = 8 if on_tpu else 2
    msgs = [eng.example(amin=-1, amax=1) for _ in range(2 * n_ct)]
    cts = [eng.encorypt(m, pk) for m in msgs]

    # CORRECTNESS-COUPLED, EXECUTION-SYNCED timing (see
    # liberate_tpu/utils/benchtime.py for the methodology and its
    # validation): distinct input pairs, all products accumulated
    # homomorphically into one ciphertext that is (a) fetched over d2h so
    # the clock provably covers device execution, (b) decrypted and
    # checked after timing, and (c) measured at two chain lengths whose
    # difference cancels the fixed d2h/drain overhead.
    last_acc = [None]

    def chain(K):
        acc = None
        for i in range(K):
            a, b = cts[(2 * i) % (2 * n_ct)], cts[(2 * i + 1) % (2 * n_ct)]
            o = eng.mult(a, b, evk)
            acc = o if acc is None else eng.add(acc, o)
        last_acc[0] = (acc, K)
        return acc.data

    benchtime.sync(chain(2))  # warm: compiles + switch to synced mode
    k1, k2 = (8, 40) if on_tpu else (1, 2)
    sec_per_mult = benchtime.diff_time(chain, k1, k2,
                                       trials=3 if on_tpu else 1)
    mult_per_s = 1.0 / sec_per_mult
    acc, iters = last_acc[0]

    # NTT roofline: GB/s of the fused forward NTT vs the chip's HBM
    # bandwidth (BASELINE.md "memory-bound roofline" target), PLUS the
    # compute roofline of the binding resource (the transform is
    # VPU-compute-bound, not HBM-bound): achieved modular multiplies/s
    # in the transform vs the measured pure Shoup-multiply ceiling at
    # the same shape.
    roofline = _ntt_roofline(eng, iters=50 if on_tpu else 2)

    # Verify correctness: a broken fast path must not report throughput.
    want = sum(msgs[(2 * i) % (2 * n_ct)] * msgs[(2 * i + 1) % (2 * n_ct)]
               for i in range(iters))
    errv = abs(eng.absmax_error(eng.decrode(acc, sk), want))
    assert errv < 1e-3, f"mult-sum decryption error too large: {errv}"
    # Generous single-A100 estimate; derivation documented in BASELINE.md.
    baseline_target = 1000.0  # mult/s
    print(json.dumps({
        "metric": f"ckks_mult_relin_rescale_logN{params['logN']}",
        "value": round(mult_per_s, 4),
        "unit": "mult/s",
        "vs_baseline": round(mult_per_s / baseline_target, 4),
        **roofline,
    }))


# Peak HBM bandwidth per chip. v5e ("TPU v5 lite"): 819 GB/s.
_HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5p": 2765.0,
             "TPU v6 lite": 1640.0}

# Peak int8 MXU throughput per chip (TOPS).
_MXU_TOPS = {"TPU v5 lite": 394.7, "TPU v4": 275.0, "TPU v5p": 918.0,
             "TPU v6 lite": 918.0}


def _ntt_roofline(eng, iters):
    """Measure the fused forward NTT's achieved HBM bandwidth."""
    import numpy as np
    from liberate_tpu.ntt import ops

    pack = eng.pack(0, -2)
    C = int(pack.q2.shape[1])
    N = eng.ctx.N
    rng = np.random.default_rng(9)
    qs = np.array(eng.ctx.q[:C] if C <= len(eng.ctx.q)
                  else list(eng.ctx.q) + [eng.ctx.q[-1]] * (C - len(eng.ctx.q)),
                  dtype=np.uint64)
    a_int = (rng.integers(0, 2 ** 62, size=(C, N), dtype=np.uint64)
             % qs[:, None]).astype(np.int64)
    import jax.numpy as jnp
    from liberate_tpu.ntt import u64 as u64m
    a = jnp.asarray(u64m.from_int64_np(a_int))

    from liberate_tpu.utils import benchtime

    f = jax.jit(lambda x, p: ops.ntt(x, p))

    def chain(K):
        out = a
        for _ in range(K):
            out = f(out, pack)   # self-feeding: a real dependency chain
        return out

    benchtime.sync(chain(1))
    best = benchtime.diff_time(chain, max(1, iters // 5), iters, trials=3)
    if best <= 0:
        # Tunnel-noise negative diff (rare): one retry, else omit the
        # roofline keys rather than print garbage.
        best = benchtime.diff_time(chain, max(1, iters // 5), iters,
                                   trials=3)
    if best <= 0:
        return {"ntt_shape": f"C{C}xN{N}"}

    # Bytes: data in + out, plus twiddle planes read once per transform.
    data_bytes = 2 * (2 * C * N * 4)
    tw_bytes = 0
    if pack.pallas is not None:
        p = pack.pallas
        tw_bytes = sum(int(np.prod(x.shape)) * 4
                       for x in (p.row_tw, p.lane_tw, p.consts))
    elif pack.psi is not None:
        tw_bytes = int(np.prod(pack.psi.shape)) * 4
    gbps = (data_bytes + tw_bytes) / best / 1e9

    dev_kind = jax.devices()[0].device_kind
    peak = _HBM_GBPS.get(dev_kind)
    out = {"ntt_gbps": round(gbps, 1),
           "ntt_ms": round(best * 1e3, 4),
           "ntt_shape": f"C{C}xN{N}"}
    if peak:
        out["ntt_roofline_pct"] = round(100.0 * gbps / peak, 1)

    # Compute roofline of the BINDING resource (BASELINE.md
    # "speed-of-light" target). With the MXU matmul backend (the TPU
    # default since round 5) the transform's arithmetic rides the
    # systolic array: report achieved int8 MAC/s against the chip's MXU
    # peak. On the VPU butterfly backend, report achieved modular
    # multiplies/s instead (the transform is twiddle-multiply-bound).
    logN = N.bit_length() - 1
    if pack.mxu is not None:
        # MACs per channel: stage1 [dA*S, dB*S]@[dB*S, R] +
        # stage2 [dA*R, dB*R]@[dB*R, S] = dA*dB*N*(S+R); width groups
        # have per-group digit counts.
        ref = pack.mxu
        total_macs = 0
        groups = ref.groups or ((0, C, ref.plan),)
        start = ref.idx[0] if ref.idx else 0
        for gs, ge, gplan in groups:
            lo, hi = max(gs, start), min(ge, start + C)
            if hi <= lo:
                continue
            S, R = gplan.S, gplan.R
            total_macs += (hi - lo) * gplan.dA * gplan.dB * N * (S + R)
        peak_tops = _MXU_TOPS.get(dev_kind)
        out["ntt_mxu_tops"] = round(total_macs / best / 1e12, 1)
        if peak_tops:
            out["ntt_mxu_util_pct"] = round(
                100.0 * (total_macs / best / 1e12) / peak_tops, 1)
    else:
        # N/2*logN butterfly twiddle multiplies per channel; ~2e12
        # emulated 62-bit modmul/s is the measured v5e VPU ceiling for a
        # pure Shoup-multiply chain (benchmarks/ntt_probe6.py).
        achieved = C * (N // 2) * logN / best
        out["ntt_modmul_gps"] = round(achieved / 1e9, 2)
    return out


if __name__ == "__main__":
    main()
