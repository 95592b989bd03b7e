#!/bin/bash
# One TPU work session: ping, tiled-flag A/B, fresh device trace.
#
# The tunneled TPU runtime allows ONE client at a time and wedges for
# tens of minutes if a client dies mid-init or mid-remote-compile
# (docs/DESIGN.md 7) — so every step runs sequentially, exits cleanly,
# and gets a generous timeout. Run from the repo root:
#   bash benchmarks/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
set -u
cd "$(dirname "$0")/.."

echo "== ping =="
timeout 900 python - <<'EOF' || { echo "PING FAILED — tunnel down, stop."; exit 1; }
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
t0 = time.time()
x = jnp.ones((8, 128), jnp.uint32)
v = np.asarray(jax.device_get((x * 3 + 1)[:1, :1]))
print("ping ok", jax.devices()[0].platform, f"{time.time()-t0:.1f}s", flush=True)
EOF

echo "== tiled A/B (silver) =="
for cfg in base moddown rescale extend all mxu mxu_all; do
  echo "-- config $cfg --"
  timeout 2400 python benchmarks/ab_tiled.py "$cfg" || echo "CONFIG $cfg FAILED rc=$?"
  sleep 5
done

echo "== profile (fused-switch silver mult) =="
timeout 1800 python - <<'EOF' || echo "PROFILE FAILED rc=$?"
import sys
sys.path.insert(0, "/root/repo")
import jax, numpy as np
from liberate_tpu.fhe.engine import CkksEngine
eng = CkksEngine(seed=1, logN=15, scale_bits=40, num_special_primes=2)
sk = eng.create_secret_key(); pk = eng.create_public_key(sk); evk = eng.create_evk(sk)
m = [eng.example(amin=-1, amax=1) for _ in range(4)]
cts = [eng.encorypt(x, pk) for x in m]
acc = None
for i in range(4):
    o = eng.mult(cts[(2*i) % 4], cts[(2*i+1) % 4], evk)
    acc = o if acc is None else eng.add(acc, o)
_ = np.asarray(jax.device_get(acc.data[0][0, 0, :1]))
print("warm done", flush=True)
jax.profiler.start_trace("/tmp/jaxtrace_r2")
acc = None
for i in range(6):
    o = eng.mult(cts[(2*i) % 4], cts[(2*i+1) % 4], evk)
    acc = o if acc is None else eng.add(acc, o)
_ = np.asarray(jax.device_get(acc.data[0][0, 0, :1]))
jax.profiler.stop_trace()
print("trace done", flush=True)
EOF
python benchmarks/trace_summary.py /tmp/jaxtrace_r2 20 || true
echo "== session done =="
