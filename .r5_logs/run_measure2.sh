#!/bin/bash
# VERDICT r4 items 2-4: MIRAGE turbo compare, variance tables, warm restart, 66s trace
cd /root/repo
set -x
# item 2: turbo-in-fold at B=1/4/8, 22s
for B in 1 4 8; do
  timeout 4000 python tools/bench_mirage.py --batch $B --compare-turbo --iters 2 > .r5_logs/mirage22_b$B.json 2> .r5_logs/mirage22_b$B.err
done
# item 2 (66s): B=1/2 (B=4 likely OOM per r3); turbo compare
for B in 1 2; do
  timeout 6000 python tools/bench_mirage.py --batch $B --model-len 66s --compare-turbo --iters 2 > .r5_logs/mirage66_b$B.json 2> .r5_logs/mirage66_b$B.err
done
# item 3: variance protocol (5 process-level runs each)
timeout 9000 python tools/bench_variance.py --only mixer --runs 5 --iters 5 > .r5_logs/variance_mixer.json 2> .r5_logs/variance_mixer.err
timeout 9000 python tools/bench_variance.py --only clapdae --runs 5 --iters 5 > .r5_logs/variance_clapdae.json 2> .r5_logs/variance_clapdae.err
# item 3b: warm restart
timeout 9000 python tools/bench_warm_restart.py --procs 3 > .r5_logs/warm_restart.json 2> .r5_logs/warm_restart.err
echo DONE_MEASURE2
# item 4: xprof the 66s B=1 phases (inner CFG loop + outer v-DDIM loop)
timeout 4000 python tools/profile.py trace --model ldm --model-len 66s --batch 1 --steps 10 > .r5_logs/trace66_ldm.log 2>&1
timeout 4000 python tools/profile.py trace --model outer --model-len 66s --batch 1 --steps 10 > .r5_logs/trace66_outer.log 2>&1
echo DONE_TRACES
# train-step trace (flash on): where does the 0.36 train MFU go
AA_TRAIN_FLASH=1 timeout 4000 python tools/profile.py train-trace --batch 16 --reps 2 > .r5_logs/train_trace_flash.log 2>&1
echo DONE_TRAIN_TRACE
