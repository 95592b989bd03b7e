"""Summarize a jax.profiler trace: device time per op, grouped.

Usage: python benchmarks/trace_summary.py [trace_dir] [top_n]

Reads the perfetto-style trace.json.gz that jax.profiler.start_trace
emits and prints total device-side time per op name (TPU op track
events), grouped into coarse buckets (pallas kernels / XLA fusions /
collectives / infeed-outfeed), most expensive first. This is the
profiling loop for the optimization fronts in docs/DESIGN.md 6 — the
device trace is the ONLY trustworthy per-op timing on the tunneled
runtime (see liberate_tpu/utils/benchtime.py).
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def load_events(trace_dir):
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    evs = []
    for p in sorted(paths)[-1:]:        # newest capture only
        with gzip.open(p, "rt") as f:
            evs.extend(json.load(f).get("traceEvents", []))
    return evs


def device_op_times(evs):
    """{op_name: total_us} for complete events on TPU device tracks."""
    # Map (pid, tid) -> track name via metadata events.
    names = {}
    pids = {}
    for e in evs:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    out = defaultdict(float)
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        proc = pids.get(e["pid"], "")
        track = names.get((e["pid"], e.get("tid")), "")
        if "TPU" not in proc and "TPU" not in track:
            continue
        # XLA op tracks carry the compiled program's per-op events.
        if "XLA Ops" in track or "Steps" in track or "TensorFlow" in track:
            out[e["name"]] += e["dur"]
        elif "XLA Modules" not in track and "source" not in track.lower():
            out[e["name"]] += e["dur"]
    return out


def bucket(name):
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas"
    if "all-reduce" in n or "all-gather" in n or "collective" in n \
            or "permute" in n:
        return "collective"
    if "fusion" in n:
        return "xla-fusion"
    if "copy" in n or "infeed" in n or "outfeed" in n or "transfer" in n:
        return "data-movement"
    return "other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    times = device_op_times(load_events(trace_dir))
    total = sum(times.values())
    buckets = defaultdict(float)
    for k, v in times.items():
        buckets[bucket(k)] += v
    print(f"total device us: {total:.0f}")
    for b, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:<14} {v/1000:9.2f} ms  {100*v/max(total,1):5.1f}%")
    print(f"top {top_n} ops:")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"  {v/1000:9.3f} ms  {k[:100]}")


if __name__ == "__main__":
    main()
