#!/bin/bash
# Waits for the axon TPU pool, then hands off to tools/tpu_stages.sh.
# Kept minimal and STABLE: tpu_stages.sh stays editable until pool-up
# (bash reads scripts incrementally; never edit a running script).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcache

echo "[wait] waiting for TPU pool at $(date)" | tee -a /tmp/r3p2.log
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
echo "[wait] TPU up at $(date)" | tee -a /tmp/r3p2.log
exec bash tools/tpu_stages.sh
