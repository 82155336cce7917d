#!/bin/bash
# Round-3 TPU work queue: runs unattended once the chip is reachable.
# Serializes all TPU jobs (one tunnel).  Logs to /tmp/r3_queue.log.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_queue.log
cd /tmp/h2h_r3 || exit 1
echo "=== r3 TPU queue start $(date) ===" >> $LOG

# 0. wait for the chip to answer a trivial computation
until timeout 120 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))))" \
    >> $LOG 2>&1; do
  echo "chip not ready $(date)" >> $LOG
  sleep 120
done
echo "chip OK $(date)" >> $LOG

# 1. repo-side h2h trainings (same corpus/budget as the TF side) + scoring
for fam in fsrgan srgan autoencoder pix2pix; do
  echo "--- train_repo $fam $(date) ---" >> $LOG
  timeout 3000 python /root/repo/tools/h2h_tf_reference.py train_repo \
      --family $fam >> $LOG 2>&1
  echo "rc=$? $fam" >> $LOG
  timeout 1500 python /root/repo/tools/h2h_tf_reference.py score_repo \
      --family $fam >> $LOG 2>&1
  echo "score rc=$? $fam" >> $LOG
done

# 2. cross-oracle eval on the h2h models (libjpeg vs DCT oracle)
for fam in fsrgan srgan autoencoder pix2pix; do
  echo "--- cross_oracle $fam $(date) ---" >> $LOG
  timeout 2400 python /root/repo/tools/cross_oracle_eval.py \
      --model models/h2h_$fam.dgt --qs 30,50,70 >> $LOG 2>&1
  echo "rc=$? cross_oracle $fam" >> $LOG
done

echo "=== r3 TPU queue done $(date) ===" >> $LOG
