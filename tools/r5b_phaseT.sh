#!/bin/bash
# Round-5b phase T rerun: the host reset wiped /tmp/r5 (the first queue
# pass's lever logs died with it; only the bench x3 numbers were committed
# to PERF.md in time).  This is tools/r5_queue.sh's phase T alone, relaunched
# on the live chip with a quiet host — no CPU trainings exist yet to pause.
# Usage: setsid nohup bash tools/r5b_phaseT.sh > /tmp/r5/queue.log 2>&1 &
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
RES=/tmp/r5/results
mkdir -p $RES
LOCK=/tmp/r5/queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue already running ($LOCK exists)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "--- $name start $(date -u +%H:%M:%S) ---"
  timeout "$t" "$@" > "$RES/$name.log" 2>&1
  echo "rc=$? $name $(date -u +%H:%M:%S)"
}

# killable probe so a dead tunnel fails fast instead of hanging.  600 s:
# the probe COMPILES a matmul through the tunnel (~1-5 min cold), so the
# r5_queue.sh 240 s budget false-negatives on a cold cache (seen 02:33Z).
if ! timeout 600 python -c "
import jax, jax.numpy as jnp
a = jnp.ones((256, 256)); b = a * 2
print(float(jnp.sum(a @ b)))" > "$RES/probe.log" 2>&1; then
  echo "chip=down $(date)"; exit 2
fi
echo "chip=up $(date)"

step bench1 1500 python bench.py
step bench2 1500 python bench.py
step bench3 1500 python bench.py
step exp_qh8 2400 python tools/exp_qh8.py
step exp_u8_input 2400 python tools/exp_u8_input.py
step exp_brc_multires 3600 python tools/exp_brc_multires.py
step exp_2frame 2400 python tools/exp_2frame.py
step exp_q8_exact 3600 python tools/exp_q8_exact.py both
echo "PHASE T DONE $(date)"
