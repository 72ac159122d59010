#!/bin/bash
for scene in 0 1 2 3; do
  SCENE_NUM=$scene python scripts/gaus.py configs/scannetpp/config.py
done
