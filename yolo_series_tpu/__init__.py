"""yolo-series-tpu: a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of the qbxlvnf11/yolo-series
(YOLOv7-fork) reference: training (incl. SimOTA / aux deep supervision),
evaluation (COCO mAP protocol), inference, re-parameterized deployment,
quantized serving, and human-detection fine-tuning on CrowdHuman+SHEL —
redesigned TPU-first:

  * NHWC tensors, static shapes, one jitted train step
  * mesh/pjit data parallelism (no DDP wrappers), pmean-synced BatchNorm
  * fixed-shape on-device batched NMS (no host round trip)
  * re-parameterization (RepConv / Conv+BN / Implicit fusion) as pure
    weight-space pytree transforms
"""

__version__ = "0.1.0"
