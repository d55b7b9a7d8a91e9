"""eop_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of
IN2-ViAUn/Exploration-of-Potential ("Exploration of the Potential of Feature
Maps" + the 24-point fisheye detector).

The framework re-implements, TPU-first, every capability of the reference:

* YOLOX-family detectors (CSPDarknet / VGG19 / ResNet50 / DenseNet121
  backbones, PAFPN neck, decoupled head) — ``eop_tpu.models``
* the 24-point radial-polygon detector (26-channel head, concentric-circle
  GIoU, polygon SimOTA, DWA loss weighting) — ``eop_tpu.models`` /
  ``eop_tpu.losses``
* data pipeline (COCO, mosaic/mixup augmentation, 24p txt labels, label
  generation by mask ray casting) — ``eop_tpu.data``
* training runtime (jitted train step, EMA, yoloxwarmcos schedule, orbax
  checkpoints, mesh data-parallelism) — ``eop_tpu.train`` / ``eop_tpu.parallel``
* evaluation (COCO/VOC AP, native fast-COCOeval C++ extension, TPU NMS)
  — ``eop_tpu.eval`` / ``eop_tpu.layers``
* the feature-map exploration harness (sector distortion, FPN heatmap stats,
  per-distortion AP sweep) — ``eop_tpu.tools``

Design stance: models are pure functions over pytrees (flax.linen), tensors
are NHWC (XLA TPU native layout), every training-path computation has static
shapes (labels padded to ``max_labels``), data parallelism is a
``jax.sharding.Mesh`` + NamedSharding (no launcher processes), and hot
non-matmul ops (circle GIoU, polygon tests, NMS) are vectorized for the VPU
with Pallas kernels where fusion wins.
"""

__version__ = "0.1.0"
