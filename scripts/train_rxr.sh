#!/bin/bash
# RxR-CE pipeline (run_rxr/main.bash equivalent). Modes: train | eval | infer
mode=${1:-train}
flags="--exp-config configs/rxr.yaml --num-envs 8 --ckpt-dir checkpoints/rxr"
case $mode in
  train) python -m etpnav_tpu.run $flags --run-type train ;;
  eval)  python -m etpnav_tpu.run $flags --run-type eval ;;
  infer) python -m etpnav_tpu.run $flags --run-type inference \
           --predictions-file results/rxr_test_predictions.jsonl ;;
esac
