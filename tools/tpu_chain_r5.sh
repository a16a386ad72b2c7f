#!/bin/bash
# Round-5 TPU chain: production-quality evidence at the REFERENCE view
# regime (49 views, 384x512 — DTU scans are 49-64 views,
# ref:models/dataset.py:41-96), upgrading the 6-view rows:
#   1. multi-seed quality: 3 seeds x {wmask, womask} @ 20k, stock CLI
#      -> .r5chain/summary.json (tools/multiseed_quality_eval.py)
#   2. wmask full reference budget 300k (ref:confs/womask.conf:21)
#      -> chamfer-vs-iteration curve over the every-5k meshes
# Scene: the 49-view analytic-sphere scene from the round-5 womask run
# (.womask49/data/fake_scan, y_range elevation arc).
set -u
cd /root/repo
RUN=/root/repo/.r5chain
DATA=/root/repo/.womask49/data
mkdir -p $RUN

for v in wmask womask; do
  for s in 0 1 2; do
    sed -e "s#./public_data/CASE_NAME/#$DATA/CASE_NAME#" \
        -e "s#./exp/CASE_NAME#$RUN/exp_${v}_s${s}/CASE_NAME#" \
        confs/$v.conf > $RUN/${v}_s${s}.conf
    python - "$RUN/${v}_s${s}.conf" <<'PY'
import re, sys
p = sys.argv[1]
t = open(p).read()
t = re.sub(r"recording = \[[^]]*\]", "recording = []", t)
t = t.replace("end_iter = 300000", "end_iter = 20000")
open(p, "w").write(t)
PY
    echo "=== msq49 $v seed $s start $(date) ==="
    timeout 7200 python exp_runner.py --mode train --conf $RUN/${v}_s${s}.conf \
      --case fake_scan --type dtu --seed $s \
      > $RUN/${v}_s${s}.log 2>&1
    rc=$?; echo "=== msq49 $v seed $s done rc=$rc $(date) ==="
    [ $rc -ne 0 ] && exit $rc
  done
done
python tools/multiseed_quality_eval.py $RUN | tee $RUN/summary.json
echo "=== MSQ49 DONE rc=$? $(date) ==="

# --- full 300k wmask at 49 views ---
sed -e "s#./public_data/CASE_NAME/#$DATA/CASE_NAME#" \
    -e "s#./exp/CASE_NAME#$RUN/exp_300k/CASE_NAME#" \
    confs/wmask.conf > $RUN/wmask300k.conf
python - "$RUN/wmask300k.conf" <<'PY'
import re, sys
p = sys.argv[1]
t = open(p).read()
t = re.sub(r"recording = \[[^]]*\]", "recording = []", t)
open(p, "w").write(t)
PY
echo "=== wmask 300k @49v start $(date) ==="
timeout 21600 python exp_runner.py --mode train --conf $RUN/wmask300k.conf \
  --case fake_scan --type dtu --seed 0 \
  > $RUN/wmask300k.log 2>&1
rc=$?; echo "=== wmask 300k @49v done rc=$rc $(date) ==="
[ $rc -ne 0 ] && exit $rc
python tools/mesh_curve.py $RUN/exp_300k/fake_scan/wmask/geometry \
  --every 25000 --out evidence/mesh_curve_wmask300k_49v.jsonl
echo "=== R5 CHAIN DONE rc=$? $(date) ==="
