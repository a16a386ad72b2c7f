#!/bin/bash
# Tunnel-wedge recovery: probe the TPU with a trivial op every 3 min; as
# soon as it answers, relaunch the round-5 chain (which restarts cleanly —
# seed 0 had produced no artifacts).
set -u
cd /root/repo
for i in $(seq 1 80); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "=== TPU recovered after $i probes $(date) ==="
    rm -rf /root/repo/.r5chain
    exec bash tools/tpu_chain_r5.sh
  fi
  sleep 180
done
echo "=== TPU never recovered $(date) ==="
exit 1
