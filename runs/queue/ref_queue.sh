#!/bin/bash
# Round-4 background parity queue (CPU torch/JAX). Sequential.
cd /root/repo
P="nice -n 10 python scripts/parity_runs.py"
# 1. FairGo dual runs for the missing seeds: produce BOTH the standard
#    FairGo_PMF_ref_<seed>.json and the small-batch FairGo_PMF_sb_ref_<seed>.json
for s in 2023 2024; do
  [ -f runs/parity/FairGo_PMF_sb_ref_$s.json ] || $P --run FairGo_PMF_sb --framework ref --seed $s
done
# 2. the three remaining PFCN towers, ref then ours, all seeds
$P --matrix --models PFCN_MLP PFCN_BiasedMF PFCN_DMF --frameworks ref
$P --matrix --models PFCN_MLP PFCN_BiasedMF PFCN_DMF --frameworks ours
# 3. small-batch top-ups for the already-recorded seeds (full retrains; the
#    standard JSON exists so only the sb artifact is written)
for s in 2022 2021 2020; do
  [ -f runs/parity/FairGo_PMF_sb_ref_$s.json ] || $P --run FairGo_PMF_sb --framework ref --seed $s
done
echo "[queue] done $(date)"
