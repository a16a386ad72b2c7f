#!/bin/bash
# Round-4 TPU work chain (relaunched after a host reboot killed the
# previous in-flight runs):
#   1. 5 fresh jax parity seeds (full architecture, 5000 iters) into
#      .parity_r4b — the jax half of the 5v5 refresh; the torch half
#      runs concurrently on CPU (tools/torch_seeds_r4.sh).
#   2. the full-reference-budget run (VERDICT r3 item 2), kernel sweep
#      skipped (its results landed in BENCHMARKS.md earlier this round),
#      which itself chains the multi-seed 20k quality sweep (item 8).
set -u
cd /root/repo
W=.parity_r4b
for s in 0 1 2 3 4; do
  echo "=== jax seed $s start $(date) ==="
  python tools/e2e_torch_parity.py jax $W --seed $s \
    > $W/jax_s$s.log 2>&1
  echo "=== jax seed $s done rc=$? $(date) ==="
done
echo "=== jax seeds done; full-budget chain start $(date) ==="
FNEUS_SKIP_KERNEL_SWEEP=1 bash tools/full_budget_run.sh \
  > /root/repo/.fullrun_r4.log 2>&1
echo "=== TPU CHAIN DONE rc=$? $(date) ==="
