#!/bin/bash
# R2R-CE pipeline (run_r2r/main.bash equivalent). Modes: train | eval | infer
mode=${1:-train}
flags="--exp-config configs/r2r.yaml --num-envs 8 --ckpt-dir checkpoints/r2r"
case $mode in
  train) python -m etpnav_tpu.run $flags --run-type train ;;
  eval)  python -m etpnav_tpu.run $flags --run-type eval --episode-count 1839 ;;
  infer) python -m etpnav_tpu.run $flags --run-type inference \
           --predictions-file results/r2r_test_predictions.json ;;
esac
