"""U-Faster R-CNN+: Mask R-CNN minus the mask head, plus semantic seg
supervision.

Capability-parity rebuild of the reference's ``models/ufrcnn.py``: the mrcnn
two-stage pipeline with ``frcnn_mode`` (no mask head/targets,
``models/ufrcnn.py:891-894``), an ``operate_stride1`` FPN whose P0 output
feeds a 1x1 semantic-segmentation head (``models/ufrcnn.py:945-946``), and an
added (dice + CE)/2 segmentation loss (``models/ufrcnn.py:896-899``). The
results dict carries argmaxed seg maps instead of instance masks.
"""

from __future__ import annotations

from medicaldetectiontoolkit_tpu.models import register
from medicaldetectiontoolkit_tpu.models.mrcnn import MaskRCNNDetector


@register("ufrcnn")
class UFRCNNDetector(MaskRCNNDetector):
    with_mask_head = False
    with_seg_head = True
