"""Medical Detection Toolkit — TPU-native rebuild.

A JAX/XLA/Pallas re-design of the Medical Detection Toolkit
(MIC-DKFZ/medicaldetectiontoolkit): 2D+3D medical object detection /
instance segmentation with Mask R-CNN, Faster R-CNN+, U-Faster R-CNN+,
RetinaNet, Retina U-Net and Detection U-Net over a shared FPN backbone,
patch-based training, tiled/ensembled whole-volume inference, weighted box
clustering and object-/patient-level evaluation.

Design stance (vs. the PyTorch/CUDA reference):
  * pure-functional models: ``init(rng) -> params``; jitted
    ``train_step`` / ``predict`` with fixed shapes (padding + validity masks
    replace every dynamic-shape construct of the reference),
  * device compute path is JAX/XLA with Pallas kernels for the hot
    non-matmul ops (NMS, RoIAlign),
  * scale-out via ``jax.sharding.Mesh`` + NamedSharding data parallelism
    instead of the reference's single implicit CUDA device,
  * host side (augmentation, WBC consolidation, evaluation) stays
    NumPy/pandas, mirroring the reference's host/device boundary but
    without its mid-forward device round-trips.
"""

__version__ = "0.1.0"
