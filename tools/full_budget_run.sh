#!/bin/bash
# VERDICT r3 item 2: one run at the FULL reference budget — stage-1 wmask
# 300k iters + stage-2 10k + stage-3 40k (production save/val/mesh freqs),
# plus a womask run past anneal_end=50000 — stock CLIs, fabricated 6-view
# analytic sphere scene (no real DTU scan is mounted in this image).
set -e
cd /root/repo
RUN=/root/repo/.fullrun
mkdir -p $RUN
python - <<'PY'
import sys; sys.path.insert(0, "tests")
from make_fake_dtu import make_fake_dtu_scene
make_fake_dtu_scene("/root/repo/.fullrun/data/fake_scan", n_views=6, H=128, W=160)
print("scene ready")
PY
for v in wmask womask; do
  sed -e "s#./public_data/CASE_NAME/#$RUN/data/CASE_NAME#" \
      -e "s#./exp/CASE_NAME#$RUN/exp_$v/CASE_NAME#" \
      -e "s#recording = \[#recording = [\n#" \
      confs/$v.conf > $RUN/$v.conf
done
# recording block copies ./ sources — harmless but slow on .fullrun; strip it
python - <<'PY'
import re
for v in ("wmask", "womask"):
    p = f"/root/repo/.fullrun/{v}.conf"
    t = open(p).read()
    t = re.sub(r"recording = \[[^]]*\]", "recording = []", t)
    if v == "womask":
        # cross anneal_end=50000 with margin; full 300k is the wmask run
        t = t.replace("end_iter = 300000", "end_iter = 60000")
    open(p, "w").write(t)
PY
# --- short TPU jobs first: geometry-kernel experiment sweep (VERDICT r4
# item 3) + the Pallas-in-shard_map composition check (item 5) ------------
if [ -z "${FNEUS_SKIP_KERNEL_SWEEP:-}" ]; then
  SWEEP=$RUN/geom_kernel_sweep.jsonl
  : > $SWEEP
  for cfgargs in "" "--fwd-block 512" "--fwd-block 1024" "--fwd-block 2048" \
                 "--stash 1" "--stash 1 --block 384"; do
    echo "--- bench_geom_kernel $cfgargs $(date)" >> $SWEEP
    timeout 900 python tools/bench_geom_kernel.py $cfgargs >> $SWEEP 2>&1 || true
  done
  echo "=== kernel sweep done $(date) ==="
fi
echo "=== shard check start $(date) ==="
timeout 1800 python bench.py --shard > $RUN/shard_check.json 2>&1 || true
echo "=== stage1 wmask 300k start $(date) ==="
time python exp_runner.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
echo "=== stage2 lvis 10k start $(date) ==="
time python lvis.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
echo "=== stage3 mateIllu 40k start $(date) ==="
time python mateIllu.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
echo "=== womask 60k start $(date) ==="
time python exp_runner.py --mode train --conf $RUN/womask.conf --case fake_scan --type dtu
echo "=== FULL BUDGET RUN DONE $(date) ==="
# chain the multi-seed 20k quality sweep (VERDICT r4 item 8) while the
# chip is warm; its own log lives under .msq/
/root/repo/tools/multiseed_quality.sh > /root/repo/.msq_run.log 2>&1 || true
echo "=== MULTISEED CHAIN DONE rc=$? $(date) ==="
