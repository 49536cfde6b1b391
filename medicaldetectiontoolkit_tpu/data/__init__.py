"""Host-side input pipeline: sampling, augmentation, seg->box conversion,
patching, threaded prefetch.

Replaces the reference's external ``batchgenerators`` dependency
(MultiThreadedAugmenter + Mirror/SpatialTransform/CenterCrop/
ConvertSegToBoundingBoxCoordinates, ``experiments/*/data_loader.py``) with an
in-repo NumPy implementation preserving the batch-dict contract:
``{'data': (b,c,y,x,(z)), 'seg': (b,1,y,x,(z)), 'pid', 'class_target',
'bb_target', 'roi_labels', 'roi_masks'}``. The key design trick is kept:
masks (not boxes) go through augmentation, boxes are drawn afterwards.
"""
