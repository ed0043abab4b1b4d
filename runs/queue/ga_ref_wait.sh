#!/bin/bash
while pgrep -f "PFCN_PMF_cm_ga --framework ref --seed 2020" > /dev/null 2>&1; do sleep 30; done
bash /root/repo/runs/queue/ga_ref_queue.sh
