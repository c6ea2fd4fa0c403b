"""ETPNav-TPU: a TPU-native JAX/XLA/Pallas framework for topological
vision-and-language navigation in continuous environments.

Rebuilds the capabilities of MarSaKi/ETPNav (reference: /root/reference) as an
idiomatic TPU stack:

- ``etpnav_tpu.ops``      — core tensor ops (masks, layer norm, attention, NMS)
- ``etpnav_tpu.models``   — model zoo (text/pano/graph planner, waypoint TRM,
                            CLIP ViT-B/32, DD-PPO depth ResNet-50)
- ``etpnav_tpu.graph``    — online topological map with incremental APSP
- ``etpnav_tpu.parallel`` — device mesh, sharding, collectives
- ``etpnav_tpu.data``     — pretraining datasets (MLM / SAP proxy tasks)
- ``etpnav_tpu.training`` — pretrain + schedule-sampling IL fine-tune loops
- ``etpnav_tpu.env``      — host-side vectorized env protocol + geometric sim
"""

__version__ = "0.1.0"
