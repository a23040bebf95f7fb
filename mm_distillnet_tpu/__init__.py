"""mm-distillnet-tpu: TPU-native (JAX/XLA/Pallas) rebuild of MM-DistillNet.

A from-scratch framework for training an audio-only object detector by
multi-teacher knowledge distillation from RGB/thermal/depth EfficientDet-D2
teachers (CVPR'21 "There is More than Meets the Eye").

Reference behavior specs are cited per-module as /root/reference/<file>:<line>.
The implementation is TPU-first: NHWC layouts, bf16 compute, fixed-shape
on-device post-processing (decode + NMS inside the compiled step), and a
single jit-compiled distillation train step sharded over a `data` mesh axis.
"""

__version__ = "0.1.0"
