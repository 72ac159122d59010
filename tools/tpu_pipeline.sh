#!/bin/bash
# Round-3 TPU measurement pipeline. Waits for the axon pool, then runs
# (sequentially — ONE TPU client at a time):
#   1. profiled short bench  -> /tmp/r3_prof.log   (per-phase frame marks)
#   2. multi-seed quality A/B -> output/quality_ab_r3.json (+ table log)
# Each stage is a fresh subprocess; everything logs to /tmp.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache

echo "[pipeline] waiting for TPU pool..." | tee /tmp/r3_pipeline.log
for i in $(seq 1 200); do
  if python - <<'PY' >> /tmp/r3_pipeline.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.arange(8.0)
print("TPU-BACK:", d, float((x*x).sum()), flush=True)
PY
  then break; fi
  sleep 120
done
echo "[pipeline] TPU up at $(date)" | tee -a /tmp/r3_pipeline.log

echo "[pipeline] stage 1: profiled short bench" | tee -a /tmp/r3_pipeline.log
GAUS_PROFILE=1 BENCH_VERBOSE=1 BENCH_SKIP_LONG=1 BENCH_SKIP_FULLRES_E2E=1 \
  BENCH_SKIP_FULLRES=1 python bench.py > /tmp/r3_prof.json 2> /tmp/r3_prof.log
echo "[pipeline] stage 1 done rc=$? at $(date)" | tee -a /tmp/r3_pipeline.log

echo "[pipeline] stage 2: quality A/B" | tee -a /tmp/r3_pipeline.log
python tools/quality_ab.py --seeds 0 1 2 --frames 100 \
  --variants default coarse0 coarse24s3 rebin1 refresh submap20 \
  --out output/quality_ab_r3.json > /tmp/r3_ab.log 2>&1
echo "[pipeline] stage 2 done rc=$? at $(date)" | tee -a /tmp/r3_pipeline.log
