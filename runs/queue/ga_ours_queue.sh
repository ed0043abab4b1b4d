#!/bin/bash
cd /root/repo
for run in PFCN_PMF_cm_ga PFCN_PMF_sm_ga; do
  for s in 2020 2021 2022; do
    [ -f runs/parity/${run}_ours_${s}_tpu.json ] || \
      nice -n 5 python scripts/parity_runs.py --run $run --framework ours --seed $s --device tpu
  done
done
[ -f runs/parity/FairGo_PMF_ga_ours_2020_tpu.json ] || \
  nice -n 5 python scripts/parity_runs.py --run FairGo_PMF_ga --framework ours --seed 2020 --device tpu
echo "[ga-ours] done $(date)"
