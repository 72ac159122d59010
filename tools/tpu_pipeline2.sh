#!/bin/bash
# Round-3 TPU measurement pipeline, v2 — staged so the most critical
# numbers land first (the pool has been flaky; the round may end mid-run).
# Stages (sequential, ONE TPU client at a time, no `timeout` wrappers):
#   0. wait for the axon pool (probe every 120 s)
#   1. profiled short bench   -> /tmp/r3_prof.json + /tmp/r3_prof.log
#   2. full bench.py x2       -> /tmp/bench_r3_f1.json, f2.json
#   3. quality A/B, seed-major, priority variants first
#      -> output/quality_ab_r3.json (+ /tmp/r3_ab.log table)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache

log() { echo "[pipe2] $* at $(date)" | tee -a /tmp/r3p2.log; }

log "waiting for TPU pool"
for i in $(seq 1 400); do
  if python - <<'PY' >> /tmp/r3p2.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.arange(8.0)
print("TPU-BACK:", d, float((x*x).sum()), flush=True)
PY
  then break; fi
  sleep 120
done
log "TPU up"

log "stage 1: profiled short bench"
GAUS_PROFILE=1 BENCH_VERBOSE=1 BENCH_SKIP_LONG=1 BENCH_SKIP_FULLRES_E2E=1 \
  BENCH_SKIP_FULLRES=1 python bench.py > /tmp/r3_prof.json 2> /tmp/r3_prof.log
log "stage 1 done rc=$?"

log "stage 2: full bench run 1"
python bench.py > /tmp/bench_r3_f1.json 2> /tmp/bench_r3_f1.log
log "stage 2 run 1 done rc=$?"
python bench.py > /tmp/bench_r3_f2.json 2> /tmp/bench_r3_f2.log
log "stage 2 run 2 done rc=$?"

log "stage 3: quality A/B (seed-major, priority order)"
python tools/quality_ab.py --seeds 0 1 2 --frames 100 \
  --variants default coarse0 rebin1 refresh submap40 submap20 coarse24s3 \
  --out output/quality_ab_r3.json > /tmp/r3_ab.log 2>&1
log "stage 3 done rc=$?"
