#!/bin/bash
cd /root/repo
# wait for the flash bench to finish (its pid file)
while kill -0 $(cat /tmp/bench1.pid) 2>/dev/null; do sleep 20; done
set -x
# flash + remat combined: the untested combination for the B=32 unlock
AA_TRAIN_FLASH=1 AA_LDM_REMAT=1 timeout 6000 python tools/bench_train.py --only clapdae --clapdae-batch 64 --skip-encode --iters 5 > .r5_logs/flashremat_b64.json 2> .r5_logs/flashremat_b64.err
bash .r5_logs/run_measure2.sh >> .r5_logs/run_measure2.log 2>&1
echo DONE_QUEUE
