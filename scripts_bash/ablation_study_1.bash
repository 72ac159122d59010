#!/bin/bash
# ablation switches A-D (EXP=1..4), Replica room0
for exp in 1 2 3 4; do
  EXP=$exp python scripts/gaus.py configs/replica/config.py
done
