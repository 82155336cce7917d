#!/bin/bash
# Round-5c quality phase: rebuild the h2h artifacts the host reset destroyed
# (/tmp/h2h_r3 held the pairs, matched-init weights, and the r4 TF-side
# matched-init outputs) and drain the quality backlog from tools/r5_queue.sh
# phase Q on the live chip.
#
# Waits for phase T (tools/r5b_phaseT.sh) to finish so the CPU-side TF
# trainings can't corrupt the fps sweeps (CLAUDE.md: 1-core host).
# Usage: setsid nohup bash tools/r5c_phaseQ.sh > /tmp/r5/phaseQ.log 2>&1 &
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
RES=/tmp/r5/results
H2H=/tmp/h2h_r3
mkdir -p $RES
LOCK=/tmp/r5/phaseQ.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "phase Q already running ($LOCK exists)"; exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "--- $name start $(date -u +%H:%M:%S) ---"
  timeout "$t" "$@" > "$RES/$name.log" 2>&1
  echo "rc=$? $name $(date -u +%H:%M:%S)"
}

# ---- wait for phase T (quiet-host timing) to finish ----
while [ -d /tmp/r5/queue.lock ]; do
  echo "phase T still running $(date -u +%H:%M:%S)"; sleep 120
done
echo "phase T done, starting Q $(date)"

# ---- 1. rebuild pairs + matched-init weights (CPU, minutes) ----
step pairs 1800 python tools/h2h_tf_reference.py pairs
step mi_srgan 900 python tools/h2h_tf_reference.py make_init --family srgan
step mi_pix2pix 900 python tools/h2h_tf_reference.py make_init --family pix2pix

# ---- 2. TF-side matched-init trainings on CPU, BACKGROUND (hours) ----
(
  timeout 14400 python tools/h2h_tf_reference.py train \
      --family srgan --matched_init 1 > "$RES/tf_srgan_mi.log" 2>&1
  echo "rc=$? tf_srgan_mi $(date -u +%H:%M:%S)" >> "$RES/tf_done.log"
  timeout 14400 python tools/h2h_tf_reference.py train \
      --family pix2pix --matched_init 1 > "$RES/tf_pix2pix_mi.log" 2>&1
  echo "rc=$? tf_pix2pix_mi $(date -u +%H:%M:%S)" >> "$RES/tf_done.log"
) &
TF_PID=$!
echo "TF mi trainings running in background (pid $TF_PID)"

# ---- 3. chip quality backlog (timing-insensitive; CPU contention ok) ----
step h5_smoke 3600 python tools/smoke_h5_tpu.py
step srgan_mi_f32 7200 python tools/h2h_tf_reference.py train_repo \
    --family srgan --matched_init 1
step srgan_mi_f32_score 3600 python tools/h2h_tf_reference.py score_repo \
    --family srgan --matched_init 1
step pix2pix_mi 7200 python tools/h2h_tf_reference.py train_repo \
    --family pix2pix --matched_init 1
step pix2pix_mi_score 3600 python tools/h2h_tf_reference.py score_repo \
    --family pix2pix --matched_init 1
for s in 2 3; do
  step srgan_mi_s$s 7200 python tools/h2h_tf_reference.py train_repo \
      --family srgan --matched_init 1 --rseed $s
  step srgan_mi_s${s}_score 3600 python tools/h2h_tf_reference.py score_repo \
      --family srgan --matched_init 1 --rseed $s
done

# ---- 4. natural-photo training on chip + held-out eval ----
if [ ! -d /tmp/nat2/train/photos ]; then
  step nat_build 1800 python tools/train_natural.py build --data_root /tmp/nat2
fi
step nat_train_tpu 10800 python tools/train_natural.py train \
    --data_root /tmp/nat2 --crop 256 --steps 12000
step nat_eval 3600 python tools/eval_natural.py \
    --model models/nat_autoencoder.dgt --photos hopper --qs 10,30,50
step nat_eval_all 3600 python tools/eval_natural.py \
    --model models/nat_autoencoder.dgt --qs 10,30,50

# ---- 5. wait for the TF side, then the final report ----
wait $TF_PID
step h2h_report 1800 python tools/h2h_tf_reference.py report
echo "PHASE Q DONE $(date)"
