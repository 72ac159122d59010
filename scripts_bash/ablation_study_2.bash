#!/bin/bash
# ablation switches E-H (EXP=5..8), Replica room0
for exp in 5 6 7 8; do
  EXP=$exp python scripts/gaus.py configs/replica/config.py
done
