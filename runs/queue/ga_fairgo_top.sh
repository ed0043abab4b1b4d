#!/bin/bash
cd /root/repo
P="nice -n 10 python scripts/parity_runs.py"
for s in 2021 2022; do
  [ -f runs/parity/FairGo_PMF_ga_ref_$s.json ] || $P --run FairGo_PMF_ga --framework ref --seed $s
done
# TPU lane: wait for ga_ours2 to finish, then extra ours seeds
while pgrep -f "ga_ours2.sh" > /dev/null 2>&1; do sleep 30; done
for s in 2023 2024; do
  [ -f runs/parity/FairGo_PMF_ga_ours_${s}_tpu.json ] || \
    nice -n 5 python scripts/parity_runs.py --run FairGo_PMF_ga --framework ours --seed $s --device tpu
done
echo "[ga-fairgo-top] done $(date)"
