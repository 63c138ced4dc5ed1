#!/bin/bash
# Wait for the axon tunnel to be healthy, then run the payload script.
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
for i in $(seq 1 20); do
  timeout 60 python -c "import jax, numpy as np; jax.device_put(np.zeros(64,np.uint8)).block_until_ready(); print('HEALTHY')" 2>/dev/null | grep -q HEALTHY && break
  echo "tunnel unhealthy, retry $i" >&2
  sleep 20
done
exec timeout "${2:-550}" python -u "$1"
