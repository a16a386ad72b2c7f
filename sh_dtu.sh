#!/bin/bash
# Three-stage pipeline driver for one DTU scan (ref:sh_dtu.sh:1-18):
# stage 1 geometry+radiance -> stage 2 visibility distillation ->
# stage 3 materials+illumination -> mesh cleaning.
set -e
SCAN=${1:-97}
CONF=${2:-./confs/wmask.conf}
# the reference's case layout (ref:sh_dtu.sh --case data_DTU/dtu_scanN),
# which clean_mesh_pose.py / eval_mesh.py expect under exp/
CASE="data_DTU/dtu_scan$SCAN"

python exp_runner.py --mode train --conf "$CONF" --case "$CASE" --type dtu
python lvis.py       --mode train --conf "$CONF" --case "$CASE" --type dtu
python mateIllu.py   --mode train --conf "$CONF" --case "$CASE" --type dtu

python exp_runner.py --mode validate_mesh --conf "$CONF" --case "$CASE" --type dtu --is_continue
python clean_mesh_pose.py --scene "$SCAN" --setting "$(basename $CONF .conf)/geometry" --suffix 300000
