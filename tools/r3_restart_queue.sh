#!/bin/bash
# Round-3 restart queue (the previous session died mid-round; queue2 never
# ran and TF pix2pix h2h + its cross-oracle were lost).  Serializes all TPU
# jobs; starts the long TF-CPU pix2pix training only AFTER the
# timing-sensitive fps measurements (1-core host: CPU contention corrupts
# wall-clock fps).  Logs to /tmp/r3_restart.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_restart.log
cd /tmp/h2h_r3 || exit 1
echo "=== r3 restart queue start $(date) ===" >> $LOG

# 0. chip check
until timeout 180 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))" \
    >> $LOG 2>&1; do
  echo "chip not ready $(date)" >> $LOG
  sleep 120
done
echo "chip OK $(date)" >> $LOG

# --- phase A: timing-sensitive (CPU otherwise idle) ---------------------
echo "--- exp_q8_engine both $(date) ---" >> $LOG
timeout 4000 python /root/repo/tools/exp_q8_engine.py both >> $LOG 2>&1
echo "rc=$? exp_q8_engine" >> $LOG

cd /root/repo
echo "--- bench bf16 $(date) ---" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? bench bf16" >> $LOG
echo "--- bench q8 $(date) ---" >> $LOG
BENCH_Q8=1 timeout 2400 python bench.py >> $LOG 2>&1
echo "rc=$? bench q8" >> $LOG

echo "--- exp_int8_mosaic $(date) ---" >> $LOG
timeout 2400 python /root/repo/tools/exp_int8_mosaic.py >> $LOG 2>&1
echo "rc=$? exp_int8_mosaic" >> $LOG

echo "--- sweep_tile_defaults $(date) ---" >> $LOG
timeout 5400 python /root/repo/tools/sweep_tile_defaults.py >> $LOG 2>&1
echo "rc=$? sweep_tile_defaults" >> $LOG
echo "=== phase A done $(date) ===" >> $LOG

# --- phase B: start the long TF-CPU pix2pix h2h training (detached) -----
cd /tmp/h2h_r3
setsid nohup timeout 14400 python /root/repo/tools/h2h_tf_reference.py \
    train --family pix2pix > /tmp/h2h_pix2pix_tf.log 2>&1 &
echo "TF pix2pix train launched pid=$! $(date)" >> $LOG

# --- phase C: quality-only TPU jobs (CPU contention OK) ------------------
echo "--- cross_oracle pix2pix $(date) ---" >> $LOG
timeout 2400 python /root/repo/tools/cross_oracle_eval.py \
    --model models/h2h_pix2pix.dgt --qs 30,50,70 >> $LOG 2>&1
echo "rc=$? cross_oracle pix2pix" >> $LOG

# srgan repo-side seed study (GAN variance, VERDICT r2 #2 follow-up)
for s in 2 3; do
  echo "--- train_repo srgan rseed=$s $(date) ---" >> $LOG
  timeout 3600 python /root/repo/tools/h2h_tf_reference.py train_repo \
      --family srgan --rseed $s >> $LOG 2>&1
  echo "rc=$? train_repo srgan s$s" >> $LOG
  timeout 1800 python /root/repo/tools/h2h_tf_reference.py score_repo \
      --family srgan --rseed $s >> $LOG 2>&1
  echo "rc=$? score_repo srgan s$s" >> $LOG
done

echo "=== r3 restart queue done $(date) ===" >> $LOG
