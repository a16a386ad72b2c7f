#!/bin/bash
# VERDICT r3 item 8: multi-seed production-architecture 20k-iter quality
# runs (3 seeds wmask + 3 seeds womask) so the BENCHMARKS.md quality tables
# carry seed spreads.  Stock CLIs on the 6-view analytic-sphere scene.
set -e
cd /root/repo
RUN=/root/repo/.msq
mkdir -p $RUN
python - <<'PY'
import sys; sys.path.insert(0, "tests")
from make_fake_dtu import make_fake_dtu_scene
make_fake_dtu_scene("/root/repo/.msq/data/fake_scan", n_views=6, H=128, W=160)
print("scene ready")
PY
for v in wmask womask; do
  for s in 0 1 2; do
    sed -e "s#./public_data/CASE_NAME/#$RUN/data/CASE_NAME#" \
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
    echo "=== $v seed $s start $(date) ==="
    timeout 3600 python exp_runner.py --mode train --conf $RUN/${v}_s${s}.conf \
      --case fake_scan --type dtu --seed $s \
      > $RUN/${v}_s${s}.log 2>&1
    echo "=== $v seed $s done rc=$? $(date) ==="
  done
done
python tools/multiseed_quality_eval.py $RUN | tee $RUN/summary.json
echo "=== MULTISEED QUALITY DONE $(date) ==="
