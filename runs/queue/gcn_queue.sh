#!/bin/bash
cd /root/repo
for s in 2020 2021 2022 2023 2024; do
  [ -f runs/parity/FairGo_GCN_ours_${s}_tpu.json ] || \
    nice -n 5 python scripts/parity_runs.py --run FairGo_GCN --framework ours --seed $s --device tpu
done
echo "[gcn-queue] done $(date)"
