#!/bin/bash
# Round-3 TPU measurement, part 3. Waits for stage C (the 10-variant
# quality A/B, 30 rows) to finish, then — sequentially, ONE TPU client
# at a time:
#   D. coupled reference-shape A/B addendum (refshape, refshape_ba)
#   E. uint8/uint16-staging short bench (default shape; datum to compare
#      against the float32-staging 1.29 FPS)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache
log() { echo "[stages3] $* at $(date)" | tee -a /tmp/r3p4.log; }

n=0
log "waiting for stage C (30 rows in output/quality_ab_r3.json)"
for i in $(seq 1 240); do
  n=$(wc -l < output/quality_ab_r3.json 2>/dev/null || echo 0)
  if [ "$n" -ge 30 ]; then break; fi
  sleep 30
done
log "stage C at $n rows"

log "stage D: coupled reference-shape A/B addendum"
python tools/quality_ab.py --seeds 0 1 2 --frames 100 \
  --variants refshape refshape_ba \
  --out output/quality_ab_r3.json >> /tmp/r3_ab.log 2>&1
log "stage D done rc=$?"

log "stage E: native-dtype staging short bench (default shape)"
BENCH_SKIP_LONG=1 BENCH_SKIP_FULLRES_E2E=1 BENCH_SKIP_FULLRES=1 \
  python bench.py > /tmp/bench_r3_u8.json 2> /tmp/bench_r3_u8.log
log "stage E done rc=$?"
