#!/bin/bash
cd /root/repo
while pgrep -f ga_fairgo_top > /dev/null 2>&1; do sleep 20; done
for s in 2020 2021 2022; do
  [ -f runs/parity/FairGo_PMF_ga_sb_ref_$s.json ] || \
    nice -n 10 python scripts/parity_runs.py --run FairGo_PMF_ga_sb --framework ref --seed $s
done
echo "[ga-sb] done $(date)"
