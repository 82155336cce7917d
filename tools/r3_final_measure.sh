#!/bin/bash
# Round-3 final measurement pass: waits for the restart queue AND the TF
# pix2pix h2h training to finish, then (on a quiet 1-core CPU)
#   1. interleaved TF-CPU reference baseline, 3 reps x 4 families
#      (VERDICT r2 #6: median +- spread, original bs=1 crop=256 configs)
#   2. full h2h quality report incl. seed variants (VERDICT r2 #2)
# Logs: /tmp/r3_baseline3.log, /tmp/r3_h2h_report.log
set -u
export PYTHONPATH=/root/repo:/root/.axon_site

until grep -q "r3 restart queue done" /tmp/r3_restart.log 2>/dev/null; do
  sleep 120
done
sleep 300  # grace period for the TF pix2pix train to start writing its log
until grep -q "wrote /tmp/h2h_r3/out_tf_pix2pix.npz" \
    /tmp/h2h_pix2pix_tf.log 2>/dev/null; do
  # bail out if the TF train's log has gone stale (died): no growth in 10 min
  if [ -f /tmp/h2h_pix2pix_tf.log ] && \
     [ -z "$(find /tmp/h2h_pix2pix_tf.log -mmin -10)" ]; then
    echo "TF pix2pix log stale >10min; proceeding without it" \
        >> /tmp/r3_baseline3.log
    break
  fi
  sleep 120
done

echo "=== interleaved TF-CPU baseline $(date) ===" > /tmp/r3_baseline3.log
for rep in 1 2 3; do
  echo "--- rep $rep $(date) ---" >> /tmp/r3_baseline3.log
  for fam in srgan fsrgan autoencoder pix2pix; do
    timeout 900 python /root/repo/tools/bench_train_tf_cpu.py \
        --family $fam --steps 5 >> /tmp/r3_baseline3.log 2>&1
  done
done
echo "=== baseline3 done $(date) ===" >> /tmp/r3_baseline3.log

echo "=== h2h report $(date) ===" > /tmp/r3_h2h_report.log
cd /tmp/h2h_r3
timeout 1800 python -c "
import jax, sys
jax.config.update('jax_platforms', 'cpu')
sys.argv = ['h2h', 'report']
import runpy
runpy.run_path('/root/repo/tools/h2h_tf_reference.py', run_name='__main__')
" >> /tmp/r3_h2h_report.log 2>&1
echo "rc=$? report" >> /tmp/r3_h2h_report.log
echo "=== r3 final measure done $(date) ===" >> /tmp/r3_h2h_report.log
