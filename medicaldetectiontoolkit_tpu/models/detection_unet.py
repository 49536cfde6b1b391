"""Detection U-Net: semantic segmentation + non-parametric box heuristic.

Capability-parity rebuild of the reference's ``models/detection_unet.py``:
an operate_stride1 FPN with a 1x1 segmentation head, trained with dice / wce
/ dice+wce losses (``detection_unet.py:123-131``); detections are derived
WITHOUT parameters: per foreground class, argmax the softmax, run connected-
component labeling, keep the n_roi_candidates largest components, box them
(min-1/max+1 halo in-plane, clipped) and score each component by the max (or
median) softmax inside it (``detection_unet.py:51-83,172-213``).

Split: segmentation forward + loss + grads run in one jitted program;
connected components are inherently host-side (scipy.ndimage.label), fed by
the softmax map transferred once per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from medicaldetectiontoolkit_tpu.models import register
from medicaldetectiontoolkit_tpu.models import base
from medicaldetectiontoolkit_tpu.models.backbone import FPN, ConvND
from medicaldetectiontoolkit_tpu.ops import losses as loss_ops

import flax.linen as nn
from typing import Optional


class SegUNetModule(nn.Module):
    dim: int
    n_channels: int
    start_filts: int
    end_filts: int
    res_architecture: str
    norm: Optional[str]
    relu: str
    sixth_pooling: bool
    weight_init: Optional[str]
    num_seg_classes: int
    remat: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, img):
        fpn_outs = FPN(
            dim=self.dim,
            n_channels=self.n_channels,
            start_filts=self.start_filts,
            end_filts=self.end_filts,
            res_architecture=self.res_architecture,
            norm=self.norm,
            relu=self.relu,
            sixth_pooling=self.sixth_pooling,
            operate_stride1=True,
            weight_init=self.weight_init,
            dtype=self.dtype,
            remat=self.remat,
        )(img.astype(self.dtype))
        seg_logits = ConvND(
            dim=self.dim, features=self.num_seg_classes, ks=1, relu=None, norm=self.norm,
            weight_init=self.weight_init, dtype=jnp.float32,
        )(fpn_outs[0])
        return seg_logits  # (b, *spatial, C)


def get_coords(binary_mask, n_components, dim):
    """Boxes around the n largest connected components per batch element.

    binary_mask: (b, y, x, (z)) uint8. Contract (ref ``detection_unet.py:172-213``):
    components ranked by voxel count descending; in-plane box coords get a
    -1/+1 halo clipped to [0, in-plane extent]; z coords are [min, max+1]
    clipped to the z extent. Bounding boxes come from ``ndimage.find_objects``
    (whose slice stops are already max+1) rather than coordinate scans.

    Returns (per-element coords arrays, per-element lists of
    (bbox_slices, in-bbox boolean mask) component pairs).
    """
    binary_mask = binary_mask.astype("uint8")
    in_plane_cap = binary_mask.shape[-2]
    z_cap = binary_mask.shape[-1]
    batch_coords, batch_components = [], []
    for element in binary_mask:
        labeled, n_found = ndimage.label(element)
        object_slices = ndimage.find_objects(labeled)
        sizes = np.bincount(labeled.ravel())[1:]  # component voxel counts, label order
        largest = np.argsort(sizes)[::-1][:n_components] + 1 if n_found else []
        coords, components = [], []
        for lab in largest:
            sl = object_slices[lab - 1]
            box = [sl[0].start - 1, sl[1].start - 1, sl[0].stop, sl[1].stop]
            if dim == 3:
                box += [sl[2].start, sl[2].stop]
            coords.append(box)
            # (bbox slices, in-bbox boolean mask): score aggregation only
            # reads inside the component, and a full-volume mask per
            # component is prohibitive at patient scale (int64 * volume)
            components.append((sl, labeled[sl] == lab))
        if coords:
            coords = np.array(coords)
            np.clip(coords, 0, None, out=coords)
            coords[:, :4] = np.minimum(coords[:, :4], in_plane_cap)
            if dim == 3:
                coords[:, 4:] = np.minimum(coords[:, 4:], z_cap)
        batch_coords.append(coords)
        batch_components.append(components)
    return batch_coords, batch_components


@register("detection_unet")
class DetectionUNet(base.Detector):
    # step signature: (params, opt_state, lr, img, seg) -> (params, opt_state, loss, smax)
    train_step_n_outputs = 4
    predict_n_outputs = 1

    def build(self):
        cf = self.cf
        self.module = SegUNetModule(
            dim=cf.dim,
            n_channels=cf.n_channels,
            start_filts=cf.start_filts,
            end_filts=cf.end_filts,
            res_architecture=cf.res_architecture,
            norm=cf.norm,
            relu=cf.relu,
            sixth_pooling=cf.sixth_pooling,
            weight_init=cf.weight_init,
            num_seg_classes=cf.num_seg_classes,
            remat=base.resolve_remat(cf),
            dtype=jnp.bfloat16 if cf.compute_dtype == "bfloat16" else jnp.float32,
        )
        self._train_step_fn = jax.jit(self._train_step, donate_argnums=(0, 1))
        self._loss_eval_fn = jax.jit(self._loss_eval)
        self._predict_fn = jax.jit(self._predict)
        self.current_lr = 1e-4

    def _predict(self, params, img):
        """(params, img) -> per-voxel softmax; the sharded-inference contract
        (parallel/mesh.make_data_parallel_predict reads ``_predict`` +
        ``predict_n_outputs``)."""
        return jax.nn.softmax(self.module.apply({"params": params}, img), axis=-1)

    def init_params(self, seed: int = 0):
        cf = self.cf
        dummy = jnp.zeros((1, *cf.patch_size, cf.n_channels), jnp.float32)
        return jax.jit(self.module.init)(jax.random.PRNGKey(seed), dummy)["params"]

    # ---- device fns ----------------------------------------------------- #

    def _seg_loss(self, seg_logits, seg):
        """dice / wce / dice_wce on channel-LAST logits (fused, no transpose)."""
        cf = self.cf
        dice, ce = loss_ops.fused_seg_loss(
            seg_logits, seg, cf.num_seg_classes,
            false_positive_weight=float(cf.fp_dice_weight), class_weights=cf.wce_weights,
        )
        loss = jnp.float32(0.0)
        if cf.seg_loss_mode in ("dice", "dice_wce"):
            loss = loss + dice
        if cf.seg_loss_mode in ("wce", "dice_wce"):
            loss = loss + ce
        return loss

    def _losses(self, params, img, seg):
        seg_logits = self.module.apply({"params": params}, img)
        loss = self._seg_loss(seg_logits, seg)
        smax = jax.nn.softmax(seg_logits, axis=-1)
        return loss, smax

    def _train_step(self, params, opt_state, lr, img, seg):
        n_micro = base.resolve_grad_accum(self.cf, img.shape[0])
        if n_micro > 1:
            # loss is deterministic (no rng); the helper's key split is inert
            (loss, smax_s), grads = base.accum_value_and_grad(
                lambda p, r, im, sg: self._losses(p, im, sg),
                params, jax.random.PRNGKey(0), (img, seg), n_micro,
            )
            smax = smax_s.reshape((-1,) + smax_s.shape[2:])
        else:
            (loss, smax), grads = jax.value_and_grad(lambda p: self._losses(p, img, seg), has_aux=True)(params)
        updates, opt_state = self._optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, smax

    def _loss_eval(self, params, img, seg):
        return self._losses(params, img, seg)

    # ---- host heuristics -------------------------------------------------- #

    def _boxes_from_softmax(self, smax):
        """smax: (b, *spatial, C) numpy -> det box dicts per element."""
        cf = self.cf
        bsz = smax.shape[0]
        argmaxed = np.argmax(smax, axis=-1)  # (b, *spatial)
        box_results_list = [[] for _ in range(bsz)]
        for cl in range(1, len(cf.class_dict.keys()) + 1):
            hard_mask = (argmaxed == cl).astype("uint8")
            box_coords, rois = get_coords(hard_mask, cf.n_roi_candidates, cf.dim)
            for bix, broi in enumerate(rois):
                for nix, (nsl, nroi) in enumerate(broi):
                    vals = smax[bix, ..., cl][nsl][nroi]
                    score = float(np.max(vals)) if cf.aggregation_operation == "max" else float(np.median(vals))
                    if score > cf.detection_min_confidence:
                        box_results_list[bix].append(
                            {
                                "box_coords": np.copy(box_coords[bix][nix]),
                                "box_score": score,
                                "box_pred_class_id": cl,
                                "box_type": "det",
                            }
                        )
        return box_results_list

    # ---- host API ---------------------------------------------------------- #

    def train_forward_dispatch(self, batch, is_validation: bool = False, do_update: bool = True):
        img = base.image_to_device(batch["data"])
        seg = base.seg_to_device(batch["seg"])
        if is_validation or not do_update:
            loss, smax = self._loss_eval_fn(self.params, img, seg)
        else:
            lr = jnp.float32(self.current_lr)
            self.params, self.opt_state, loss, smax = self._train_step_fn(self.params, self.opt_state, lr, img, seg)
        return loss, smax

    def train_forward_convert(self, handles, batch, need_seg_preds: bool = True):
        # need_seg_preds is ignored: this model's detection boxes DERIVE from
        # the softmax volume, so the device->host pull is unavoidable here
        loss, smax = handles
        smax = np.asarray(smax)
        boxes = self._boxes_from_softmax(smax)
        base.add_gt_boxes_to_results(batch, boxes)
        loss = float(loss)
        return {
            "boxes": boxes,
            "seg_preds": np.argmax(smax, axis=-1)[:, None].astype("uint8"),
            "loss": loss,
            "torch_loss": loss,
            "monitor_values": {"loss": loss},
            "logger_string": f"loss: {loss:.2f}",
        }

    def test_forward_dispatch(self, batch, **kwargs):
        img = base.image_to_device(batch["data"])
        return self._predict_fn(self.params, img)

    def test_forward_convert(self, handles, batch, **kwargs):
        smax = np.asarray(handles)
        boxes = self._boxes_from_softmax(smax)
        return {
            "boxes": boxes,
            "seg_preds": np.argmax(smax, axis=-1)[:, None].astype("uint8"),
        }
