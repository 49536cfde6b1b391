"""Device-side numerics: boxes, anchors, matching, sampling, NMS, RoIAlign, losses.

TPU-native equivalents of the reference's ``utils/model_utils.py`` (NumPy+torch)
and ``cuda_functions/`` (CUDA NMS 2D/3D + RoIAlign 2D/3D). Everything here is a
pure ``jax.numpy`` function with static shapes; variable-length structures of
the reference (keep-lists, positive-anchor subsets, ...) become fixed-size
index vectors plus validity masks.
"""

from medicaldetectiontoolkit_tpu.ops import boxes, anchors, matching, nms, roi_align, losses  # noqa: F401
