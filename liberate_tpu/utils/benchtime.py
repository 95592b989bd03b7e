"""Honest device timing on asynchronously-tunneled JAX runtimes.

Measurement rules derived from probing the tunneled TPU runtime used for
benchmarking (documented here because they invalidate the naive
``block_until_ready`` loop):

1. ``jax.block_until_ready`` returns when the runtime acknowledges the
   enqueue, NOT when the device finishes executing. A chained 512 MB
   elementwise loop "measures" 34-50 TB/s on a chip with 819 GB/s of
   HBM. Every number timed that way is an enqueue rate.
2. The only operation that provably waits for execution is a
   device-to-host transfer of (a piece of) the result. Timing must end
   with a d2h of something that data-depends on every op being timed.
3. The d2h itself costs ~30 ms of tunnel latency, and the first d2h in
   a process also flushes lazily-deferred compiles. So: (a) warm up
   INCLUDING a d2h before timing, (b) measure two chain lengths K1<K2
   and report (t(K2)-t(K1))/(K2-K1), which cancels the fixed d2h/drain
   overhead exactly.

Validation: the differenced elementwise probe reports ~630 GB/s on a
v5e (77 % of peak HBM — sane), and the per-op device trace from
jax.profiler sums to the same per-op time this scheme reports for the
engine's fused mult program (35.7 ms at silver, both methods).
"""

import time

import jax
import numpy as np

__all__ = ["sync", "diff_time"]


def sync(out):
    """Force true device completion of everything ``out`` depends on.

    Fetches one leaf element over d2h — the only reliable execution
    barrier on the tunneled runtime (see module docstring).
    """
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    x = leaves[0]
    flat = x.reshape(-1)[:1]
    return np.asarray(jax.device_get(flat))


def diff_time(chain, k1, k2, trials=2):
    """Seconds per step of ``chain(K)`` via two-length differencing.

    ``chain(K)`` must run K data-dependent (or accumulator-coupled)
    steps and return a device value depending on all of them; this
    helper syncs it with a d2h and differences the two chain lengths to
    cancel fixed overhead. Caller must have warmed up (compiles + one
    sync) beforehand.
    """
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        sync(chain(k1))
        t1 = time.perf_counter()
        sync(chain(k2))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best
