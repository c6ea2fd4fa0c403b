#!/bin/bash
# MLM+SAP pretraining (pretrain_src/run_pt/run_r2r.bash equivalent)
python -m etpnav_tpu.run --exp-config configs/pretrain.yaml \
  --trainer Pretrain --run-type train
