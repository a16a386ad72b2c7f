#!/bin/bash
# Round-4 torch-side parity seeds: 2 fresh full-architecture 5000-iter
# torch-reference runs (seeds 3, 4) to complete the 5-torch-seed set
# (seeds 0-2 ran in round 3), each followed by the torch-side
# eval-protocol (perturb) ablation on its finished checkpoint.
# Runs nice'd: the TPU full-budget chain's host loop keeps priority on
# this host's single CPU core.
set -u
cd /root/repo
W=.parity_r4b
for s in 3 4; do
  echo "=== torch seed $s start $(date) ==="
  nice -n 10 python tools/e2e_torch_parity.py torch $W --seed $s \
    > $W/torch_s$s.log 2>&1
  echo "=== torch seed $s done rc=$? $(date) ==="
  nice -n 10 python tools/eval_perturb_torch.py $W --seed $s --draws 8 \
    > $W/perturb_torch_s$s.log 2>&1
  echo "=== perturb ablation seed $s done rc=$? $(date) ==="
done
echo "=== TORCH SEEDS DONE $(date) ==="
