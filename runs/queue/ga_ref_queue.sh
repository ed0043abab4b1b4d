#!/bin/bash
cd /root/repo
P="nice -n 10 python scripts/parity_runs.py"
for run in PFCN_PMF_cm_ga PFCN_PMF_sm_ga; do
  for s in 2020 2021 2022; do
    [ -f runs/parity/${run}_ref_${s}.json ] || $P --run $run --framework ref --seed $s
  done
done
[ -f runs/parity/FairGo_PMF_ga_ref_2020.json ] || $P --run FairGo_PMF_ga --framework ref --seed 2020
echo "[ga-ref] done $(date)"
