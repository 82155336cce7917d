#!/bin/bash
# Round-5d phase T: SECOND host reset wiped /tmp/r5 again before the lever
# logs could be committed.  Same steps as tools/r5b_phaseT.sh but ordered
# by value-per-minute (bench to confirm + warm the chip, then the two
# cheap levers, then the longer sweeps), and each step's log is COPIED
# into /root/repo/results/ as it lands so a further reset can't eat it.
# Usage: setsid nohup bash tools/r5d_phaseT.sh > /tmp/r5/queue.log 2>&1 &
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
RES=/tmp/r5/results
KEEP=/root/repo/results
mkdir -p $RES $KEEP
LOCK=/tmp/r5/queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue already running ($LOCK exists)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "--- $name start $(date -u +%H:%M:%S) ---"
  timeout "$t" "$@" > "$RES/$name.log" 2>&1
  local rc=$?
  cp "$RES/$name.log" "$KEEP/$name.log"
  echo "rc=$rc $name $(date -u +%H:%M:%S)"
}

# killable probe (600 s: compile through the tunnel is ~1-5 min cold)
if ! timeout 600 python -c "
import jax, jax.numpy as jnp
a = jnp.ones((256, 256)); b = a * 2
print(float(jnp.sum(a @ b)))" > "$RES/probe.log" 2>&1; then
  echo "chip=down $(date)"; cp "$RES/probe.log" "$KEEP/probe.log"; exit 2
fi
echo "chip=up $(date)"

step bench1 1500 python bench.py
step exp_qh8 2400 python tools/exp_qh8.py
step exp_u8_input 2400 python tools/exp_u8_input.py
step exp_2frame 2400 python tools/exp_2frame.py
step bench2 1500 python bench.py
step bench3 1500 python bench.py
step exp_brc_multires 3600 python tools/exp_brc_multires.py
step exp_q8_exact 3600 python tools/exp_q8_exact.py both
echo "PHASE T DONE $(date)"
