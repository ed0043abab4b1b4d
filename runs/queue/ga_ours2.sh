#!/bin/bash
# extra ours seeds so the ga rank-sum test has rejection power (3v5)
cd /root/repo
while pgrep -f "ga_ours_queue.sh" > /dev/null 2>&1; do sleep 30; done
for run in PFCN_PMF_cm_ga PFCN_PMF_sm_ga; do
  for s in 2023 2024; do
    [ -f runs/parity/${run}_ours_${s}_tpu.json ] || \
      nice -n 5 python scripts/parity_runs.py --run $run --framework ours --seed $s --device tpu
  done
done
for s in 2021 2022; do
  [ -f runs/parity/FairGo_PMF_ga_ours_${s}_tpu.json ] || \
    nice -n 5 python scripts/parity_runs.py --run FairGo_PMF_ga --framework ours --seed $s --device tpu
done
echo "[ga-ours2] done $(date)"
