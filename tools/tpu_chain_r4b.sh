#!/bin/bash
# Round-4 TPU chain, third launch (two host reboots killed the previous
# two).  Reordered so the cheapest never-landed evidence commits first:
#   1. womask 60k        — crosses anneal_end=50000 (VERDICT r3 item 2b)
#   2. wmask 300k stage-1 — the full reference budget (item 2a)
#   3. stage-2 10k, stage-3 40k chained on the 300k checkpoint (item 2a)
#   4. multi-seed 20k quality sweep (item 8)
# Stock CLIs, fabricated 6-view analytic scene (no real DTU scan mounted).
set -u
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
      confs/$v.conf > $RUN/$v.conf
done
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
echo "=== womask 60k start $(date) ==="
time python exp_runner.py --mode train --conf $RUN/womask.conf --case fake_scan --type dtu
rc=$?; echo "=== womask 60k done rc=$rc $(date) ==="
[ $rc -ne 0 ] && exit $rc
echo "=== stage1 wmask 300k start $(date) ==="
time python exp_runner.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
rc=$?; echo "=== stage1 wmask 300k done rc=$rc $(date) ==="
[ $rc -ne 0 ] && exit $rc
echo "=== stage2 lvis 10k start $(date) ==="
time python lvis.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
rc=$?; echo "=== stage2 done rc=$rc $(date) ==="
[ $rc -ne 0 ] && exit $rc
echo "=== stage3 mateIllu 40k start $(date) ==="
time python mateIllu.py --mode train --conf $RUN/wmask.conf --case fake_scan --type dtu
rc=$?; echo "=== stage3 done rc=$rc $(date) ==="
[ $rc -ne 0 ] && exit $rc
echo "=== FULL BUDGET RUN DONE $(date) ==="
/root/repo/tools/multiseed_quality.sh > /root/repo/.msq_run.log 2>&1
echo "=== MULTISEED CHAIN DONE rc=$? $(date) ==="
