#!/bin/bash
# Round-3 TPU measurement stages, part 2 (post host-sync commit 0c0707c).
# Sequential — ONE TPU client at a time, no `timeout`, never SIGKILL.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache

log() { echo "[stages2] $* at $(date)" | tee -a /tmp/r3p3.log; }

log "stage A: submap40-shaped short bench (reference Replica submap length)"
SYN_MAX_FRAMES=40 BENCH_FRAMES=122 BENCH_WARM=82 BACKEND_CAP_MULT=4.0 \
  BENCH_SKIP_LONG=1 BENCH_SKIP_FULLRES_E2E=1 BENCH_SKIP_FULLRES=1 \
  python bench.py > /tmp/bench_r3_s40.json 2> /tmp/bench_r3_s40.log
log "stage A done rc=$?"

log "stage B: fullres kernel decomposition microbench"
MB_H=680 MB_W=1200 MB_N=816000 MB_CAP=917504 MB_DMAX=4 MB_BUDGET=2 \
  python tools/microbench.py pre bin expand fwd bwd fwds bwds reduce surgery \
  > /tmp/r3_micro.log 2>&1
log "stage B done rc=$?"

log "stage C: quality A/B (variant-major priority order, resumable)"
python tools/quality_ab.py --seeds 0 1 2 --frames 100 \
  --variants default coarse0 rebin1 refresh submap40 fast kfview0 submap20 tauk15 coarse24s3 \
  --out output/quality_ab_r3.json > /tmp/r3_ab.log 2>&1
log "stage C done rc=$?"
