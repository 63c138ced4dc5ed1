#!/bin/bash
# Poll the axon relay; when healthy, immediately capture the TPU
# measurements (pallas-vs-XLA filters + the full bench).
for i in $(seq 1 90); do
  if timeout 60 python -c "import jax, numpy as np; jax.device_put(np.zeros(64,np.uint8)).block_until_ready(); print('HEALTHY')" 2>/dev/null | grep -q HEALTHY; then
    echo "tunnel healthy at attempt $i ($(date))"
    timeout 580 python -u bench_pallas.py 2>&1 | grep -v WARNING
    echo "--- bench.py ---"
    timeout 900 python bench.py 2>&1 | tail -1
    exit 0
  fi
  sleep 110
done
echo "tunnel never recovered"
exit 1
