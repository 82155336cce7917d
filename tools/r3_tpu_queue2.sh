#!/bin/bash
# Round-3 TPU queue #2: q8 measurements + seed study.  Waits for queue #1
# (/tmp/r3_queue.log "queue done") then serializes chip jobs.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r3_queue2.log
cd /tmp/h2h_r3 || exit 1
echo "=== r3 TPU queue2 start $(date) ===" >> $LOG

until grep -q "r3 TPU queue done" /tmp/r3_queue.log; do
  sleep 60
done
echo "queue1 done $(date)" >> $LOG

# 1. w8a8 tail: fps + on-chip quality, both families (VERDICT r2 #1)
timeout 4000 python /root/repo/tools/exp_q8_engine.py both >> $LOG 2>&1
echo "rc=$? exp_q8_engine" >> $LOG

# 2. headline bench, bf16 vs q8
cd /root/repo
timeout 2000 python bench.py >> $LOG 2>&1
echo "rc=$? bench bf16" >> $LOG
BENCH_Q8=1 timeout 2000 python bench.py >> $LOG 2>&1
echo "rc=$? bench q8" >> $LOG

# 3. srgan h2h repo-side seed study (GAN variance, VERDICT r2 #2)
cd /tmp/h2h_r3
for s in 2 3; do
  timeout 3000 python /root/repo/tools/h2h_tf_reference.py train_repo \
      --family srgan --rseed $s >> $LOG 2>&1
  echo "rc=$? train_repo srgan s$s" >> $LOG
  timeout 1500 python /root/repo/tools/h2h_tf_reference.py score_repo \
      --family srgan --rseed $s >> $LOG 2>&1
  echo "rc=$? score_repo srgan s$s" >> $LOG
done

echo "=== r3 TPU queue2 done $(date) ===" >> $LOG
