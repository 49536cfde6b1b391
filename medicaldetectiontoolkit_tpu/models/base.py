"""Shared detector machinery: batch conversion, results assembly, optimizer.

The reference models expose ``net.train_forward(batch)`` / ``net.test_forward
(batch)`` over NumPy batch dicts (``models/retina_net.py:380-469``). We keep
that outer contract — the trainer/predictor/evaluator all speak it — but the
inside is pure-functional JAX: a detector owns (params, opt_state) as host
references and calls donated, jitted step functions.

Host <-> device conventions:
  * batch dicts are NumPy, channel-first (b, c, y, x, (z)) like the reference;
  * device tensors are channel-last (b, y, x, (z), c);
  * variable-length GT lists are padded to ``cf.max_gt_boxes`` with masks;
  * detections come back as fixed-size (b, max_det, 2*dim+2) arrays + validity
    mask and are converted to the reference's box-dict lists on host.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax


def image_to_device(img: np.ndarray) -> jnp.ndarray:
    """(b, c, *spatial) numpy -> (b, *spatial, c) float32 device array."""
    return jnp.asarray(np.moveaxis(np.asarray(img, dtype=np.float32), 1, -1))


def seg_to_device(seg: np.ndarray) -> jnp.ndarray:
    """(b, 1, *spatial) int numpy -> device int32 (same layout)."""
    return jnp.asarray(np.asarray(seg, dtype=np.int32))


def pad_gt_boxes(gt_boxes_list, gt_ids_list, batch_size: int, dim: int, max_gt: int):
    """Pad per-element GT box lists to (b, max_gt, 2*dim) + ids + valid mask.

    Overflow beyond max_gt is truncated (the reference keeps all GTs; raise
    ``cf.max_gt_boxes`` for datasets with more objects per patch).
    """
    boxes = np.zeros((batch_size, max_gt, 2 * dim), dtype=np.float32)
    ids = np.zeros((batch_size, max_gt), dtype=np.int32)
    valid = np.zeros((batch_size, max_gt), dtype=bool)
    for b in range(batch_size):
        g = np.asarray(gt_boxes_list[b], dtype=np.float32).reshape(-1, 2 * dim) if len(gt_boxes_list[b]) else np.zeros((0, 2 * dim), np.float32)
        n = min(len(g), max_gt)
        if n:
            boxes[b, :n] = g[:n]
            ids[b, :n] = np.asarray(gt_ids_list[b], dtype=np.int32).reshape(-1)[:n]
            valid[b, :n] = True
    return jnp.asarray(boxes), jnp.asarray(ids), jnp.asarray(valid)


def detections_to_box_results(cf, detections, det_mask, box_results_list=None):
    """Fixed-shape device detections -> the reference results 'boxes' lists.

    detections: (b, max_det, 2*dim + 2) = coords (rounded), class_id, score.
    Applies the reference's zero-area and min-confidence filters
    (``models/retina_net.py:296-323``).
    """
    detections = np.asarray(detections)
    det_mask = np.asarray(det_mask)
    bsz = detections.shape[0]
    if box_results_list is None:
        box_results_list = [[] for _ in range(bsz)]
    ncoords = 2 * cf.dim
    for b in range(bsz):
        for i in np.flatnonzero(det_mask[b]):
            coords = detections[b, i, :ncoords].astype(np.int32)
            class_id = int(detections[b, i, ncoords])
            score = float(detections[b, i, ncoords + 1])
            if cf.dim == 2:
                area = (coords[2] - coords[0]) * (coords[3] - coords[1])
            else:
                area = (coords[2] - coords[0]) * (coords[3] - coords[1]) * (coords[5] - coords[4])
            if area <= 0 or score < cf.model_min_confidence:
                continue
            box_results_list[b].append(
                {"box_coords": coords, "box_score": score, "box_type": "det", "box_pred_class_id": class_id}
            )
    return box_results_list


def add_gt_boxes_to_results(batch, box_results_list):
    """Append GT boxes as monitoring box dicts (reference train_forward)."""
    for b in range(len(box_results_list)):
        if len(batch["bb_target"][b]) > 0:
            for ix in range(len(batch["bb_target"][b])):
                box_results_list[b].append(
                    {
                        "box_coords": np.asarray(batch["bb_target"][b][ix]),
                        "box_label": np.asarray(batch["roi_labels"][b]).reshape(-1)[ix],
                        "box_type": "gt",
                    }
                )
    return box_results_list


def compact_anchor_indices(matches, neg_sel, max_pos: int, max_neg: int):
    """(b, A) masks -> fixed small (idx, valid) pairs, computed on device.

    Keeps the per-step device->host monitoring transfer at O(max_pos+max_neg)
    instead of O(n_anchors).
    """
    import jax.numpy as jnp
    import jax

    from medicaldetectiontoolkit_tpu.ops import topk as topk_ops

    def topk_mask(mask, k):
        # monitoring-only selection: stochastic_top_k avoids the full-anchor
        # sort lax.top_k lowers to (2 x 10 ms/step at 3D anchor counts)
        vals, idx = topk_ops.stochastic_top_k(mask.astype(jnp.float32), k)
        return idx, vals > 0

    pos_idx, pos_valid = jax.vmap(lambda m: topk_mask(m > 0, max_pos))(matches)
    neg_idx, neg_valid = jax.vmap(lambda m: topk_mask(m, max_neg))(neg_sel)
    return pos_idx, pos_valid, neg_idx, neg_valid


def add_anchor_boxes_to_results(cf, np_anchors, anchor_info, img_shape_spatial, box_results_list):
    """Append sampled pos/neg anchors (clipped) as monitoring box dicts.

    anchor_info: (pos_idx, pos_valid, neg_idx, neg_valid) from
    compact_anchor_indices.
    """
    pos_idx, pos_valid, neg_idx, neg_valid = [np.asarray(a) for a in anchor_info]
    for b in range(pos_idx.shape[0]):
        for kind, idx, valid in (("pos_anchor", pos_idx[b], pos_valid[b]), ("neg_anchor", neg_idx[b], neg_valid[b])):
            sel = np_anchors[idx[valid]]
            if not len(sel):
                continue
            clipped = sel.copy()
            clipped[:, 0] = clipped[:, 0].clip(0, img_shape_spatial[0])
            clipped[:, 2] = clipped[:, 2].clip(0, img_shape_spatial[0])
            clipped[:, 1] = clipped[:, 1].clip(0, img_shape_spatial[1])
            clipped[:, 3] = clipped[:, 3].clip(0, img_shape_spatial[1])
            if cf.dim == 3:
                clipped[:, 4] = clipped[:, 4].clip(0, img_shape_spatial[2])
                clipped[:, 5] = clipped[:, 5].clip(0, img_shape_spatial[2])
            for row in clipped:
                box_results_list[b].append({"box_coords": row, "box_type": kind})
    return box_results_list


def unmold_mask(mask, bbox, image_shape):
    """Resize a small (mask_shape) mask into its box within a full-size image.

    Matches ``unmold_mask_2D/3D`` (``utils/model_utils.py:147-183``): order-1
    zoom of the raw mask to the box extent, placed into a zero canvas.
    """
    from scipy import ndimage

    dim = 2 if len(bbox) == 4 else 3
    if dim == 2:
        y1, x1, y2, x2 = [int(v) for v in bbox[:4]]
        out_zoom = [y2 - y1, x2 - x1]
    else:
        y1, x1, y2, x2, z1, z2 = [int(v) for v in bbox[:6]]
        out_zoom = [y2 - y1, x2 - x1, z2 - z1]
    zoom_factor = [i / j for i, j in zip(out_zoom, mask.shape)]
    small = ndimage.zoom(mask, zoom_factor, order=1).astype(np.float32)
    full_mask = np.zeros(image_shape[:dim], dtype=np.float32)
    if dim == 2:
        full_mask[y1:y2, x1:x2] = small
    else:
        full_mask[y1:y2, x1:x2, z1:z2] = small
    return full_mask


def resolve_remat(cf) -> bool:
    """cf.use_remat, or auto: remat on for 3D (does not fit HBM otherwise)."""
    use = getattr(cf, "use_remat", None)
    return bool(use) if use is not None else cf.dim == 3


def make_optimizer(cf):
    """torch.optim.Adam(lr, weight_decay) equivalent; lr applied per step.

    The transform chain produces unit-lr adam directions; the trainer scales
    by the per-epoch lr (reference sets param_group['lr'] each epoch,
    ``exec.py:59-60``).
    """
    parts = []
    if cf.weight_decay:
        parts.append(optax.add_decayed_weights(cf.weight_decay))
    parts.append(optax.scale_by_adam())
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def resolve_grad_accum(cf, bsz=None) -> int:
    """Microbatches per optimizer step (cf.grad_accum_steps, default 1).

    With the actual (static) batch size given, rounds DOWN to its largest
    divisor so shrunken batches (--dev, odd last chunks) keep training
    instead of erroring mid-run; the configured value is an upper bound.
    """
    n = int(getattr(cf, "grad_accum_steps", 1) or 1)
    if bsz is not None and n > 1:
        n = min(n, int(bsz))
        while bsz % n:
            n -= 1
    return max(n, 1)


def accum_value_and_grad(loss_fn, params, rng, batch_arrays, n_micro: int):
    """Gradient accumulation: scan n_micro microbatches inside ONE jitted step.

    ``loss_fn(params, rng, *batch_elems) -> (loss, aux)``. The batch arrays
    are split on axis 0 into ``n_micro`` equal microbatches and scanned
    sequentially; with remat on (the 3D default) live activations shrink to
    one microbatch, so the reference's effective batch size (8 at LIDC 3D,
    ``/root/reference/experiments/lidc_exp/configs.py:115``) fits a 16 GB
    chip that OOMs on the monolithic batch. Gradients are averaged, which
    equals the full-batch gradient exactly for per-element mean losses.

    Semantics note: batch-GLOBAL reductions inside loss_fn (batch dice,
    SHEM pools, weighted-CE normalization) see one microbatch at a time —
    identical to the reference's behavior at the smaller physical batch.
    Per-element rng splitting also happens per microbatch, so results are
    not bit-equal to the monolithic step (different key trees), only
    statistically equivalent.

    Returns ``((mean_loss, stacked_aux), grads)``; every aux leaf gains a
    leading n_micro axis. Callers reassemble (merge_microbatch_aux, or a
    per-microbatch lax.map for aux with flattened-batch leaves).
    """
    bsz = batch_arrays[0].shape[0]
    if bsz % n_micro:
        raise ValueError(
            f"batch size {bsz} not divisible by grad_accum_steps {n_micro}"
        )
    m = bsz // n_micro
    micro = tuple(a.reshape((n_micro, m) + a.shape[1:]) for a in batch_arrays)
    rngs = jax.random.split(rng, n_micro)
    vg = jax.value_and_grad(loss_fn, has_aux=True)

    def body(gsum, xs):
        r, mb = xs[0], xs[1:]
        (loss, aux), g = vg(params, r, *mb)
        return jax.tree_util.tree_map(jnp.add, gsum, g), (loss, aux)

    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    gsum, (losses, auxs) = jax.lax.scan(body, g0, (rngs,) + micro)
    grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
    return (jnp.mean(losses), auxs), grads


def merge_microbatch_aux(auxs):
    """Stacked (n_micro, ...) aux -> full-batch layout.

    Rank-1 leaves are per-microbatch scalars (monitor values): averaged.
    Higher-rank leaves are batch-leading arrays: first two axes merged.
    Only valid when every array leaf is batch-leading (true for the
    one-stage heads); mrcnn's flattened (b*P,) leaves need per-microbatch
    handling instead.
    """
    def fix(leaf):
        if leaf.ndim <= 1:
            return jnp.mean(leaf)
        return leaf.reshape((leaf.shape[0] * leaf.shape[1],) + leaf.shape[2:])

    return jax.tree_util.tree_map(fix, auxs)


class Detector:
    """Base class: owns (cf, logger, params, opt_state) + jitted step fns."""

    # arity of _train_step's output tuple (subclasses override if different)
    train_step_n_outputs = 5

    # dispatch/convert split (models override both): dispatch enqueues the
    # device work and returns un-forced handles; convert forces them into the
    # reference results dict. The trainer/Predictor pipeline one step deep so
    # host-side box building overlaps device compute. The serial
    # train/test_forward compositions live HERE (single extension point); the
    # dispatch defaults degrade a custom detector that only implements
    # train/test_forward back to serial.
    def train_forward_dispatch(self, batch, is_validation: bool = False, do_update: bool = True):
        return self.train_forward(batch, is_validation, do_update)

    def train_forward_convert(self, handles, batch, need_seg_preds: bool = True):
        return handles

    def train_forward(self, batch, is_validation: bool = False, do_update: bool = True,
                      need_seg_preds: bool = True):
        """One step (with optimizer update unless validating) -> the
        reference results dict: boxes, seg_preds, loss, monitor_values,
        logger_string (reference model.train_forward contract).

        ``need_seg_preds=False`` lets per-step monitoring skip materializing
        the full-volume seg prediction on the host: the device->host link is
        the slow direction on a tunneled TPU (~MB/s), training/val-sampling
        loops only consume boxes + monitor floats, and seg_preds is read only
        by the per-epoch plotting call. Models whose box results DERIVE from
        the seg output (detection_unet) ignore the flag.
        """
        if type(self).train_forward_dispatch is Detector.train_forward_dispatch:
            raise NotImplementedError(
                "detector must implement train_forward or the "
                "train_forward_dispatch/convert pair"
            )
        return self.train_forward_convert(
            self.train_forward_dispatch(batch, is_validation, do_update), batch,
            need_seg_preds=need_seg_preds,
        )

    def test_forward_dispatch(self, batch, **kwargs):
        return self.test_forward(batch, **kwargs)

    def test_forward_convert(self, handles, batch, **kwargs):
        return handles

    def test_forward(self, batch, **kwargs):
        """Inference forward -> {boxes, seg_preds} results dict (reference
        model.test_forward contract). Flags (e.g. mrcnn's return_masks)
        travel via kwargs; dispatches that don't consume them ignore them."""
        if type(self).test_forward_dispatch is Detector.test_forward_dispatch:
            raise NotImplementedError(
                "detector must implement test_forward or the "
                "test_forward_dispatch/convert pair"
            )
        return self.test_forward_convert(
            self.test_forward_dispatch(batch, **kwargs), batch, **kwargs
        )

    def enable_data_parallel(self, n_devices=None):
        """Re-jit the train step with data-parallel shardings over a device
        mesh (params replicated, batch sharded; XLA inserts the gradient
        all-reduce). Batch size must be divisible by the mesh size; host-side
        numpy batches are sharded automatically at dispatch.
        """
        from medicaldetectiontoolkit_tpu.parallel import mesh as pmesh

        n = n_devices or getattr(self.cf, "n_data_parallel", None)
        self._mesh = pmesh.get_mesh(n)
        self._train_step_fn = pmesh.make_data_parallel_step(self, self._mesh)
        # the per-epoch validation / plotting forwards run at the same batch
        # geometry as training — shard them too, or they'd idle every device
        # but one for the whole val loop
        self._loss_eval_fn = pmesh.make_data_parallel_loss_eval(self, self._mesh)
        self._predict_fn = pmesh.make_data_parallel_predict(self, self._mesh)
        if self.logger is not None:
            self.logger.info(f"data-parallel training over {len(self._mesh.devices.ravel())} devices")
        return self._mesh

    def enable_spatial_parallel(self, n_data=None, n_space=None):
        """Re-jit the train step over a 2D (data x space) mesh: batch sharded
        on 'data', image Y on 'space' (GSPMD conv halo exchanges), gradients
        all-reduced over both axes. Use when one device's HBM cannot hold the
        full-resolution activations at the desired batch size. Subject to the
        deepest-pyramid-level extent cap (see parallel.mesh._check_space_cap).
        """
        from medicaldetectiontoolkit_tpu.parallel import mesh as pmesh

        n_d = n_data or getattr(self.cf, "n_data_parallel", None) or 1
        n_s = n_space or getattr(self.cf, "n_space_parallel", None) or 1
        self._mesh = pmesh.get_mesh_2d(n_d, n_s)
        self._train_step_fn = pmesh.make_spatial_train_step(self, self._mesh)
        # the per-epoch validation / plotting forwards must be sharded too:
        # they run at the same full-resolution geometry as training, which is
        # exactly what doesn't fit one device when spatial training is on
        self._loss_eval_fn = pmesh.make_spatial_loss_eval(self, self._mesh)
        self._predict_fn = pmesh.make_spatial_predict(self, self._mesh)
        if self.logger is not None:
            self.logger.info(f"spatially-partitioned training over {n_d}x{n_s} (data x space) devices")
        return self._mesh

    def enable_spatial_parallel_inference(self, n_data=None, n_space=None):
        """Shard the jitted predict over the 2D (data x space) mesh — batch
        on 'data', image Y on 'space' (GSPMD conv halos); for volumes whose
        inference activations exceed one device's HBM. Bit-exact vs the
        single-device path (tests/test_parallel.py); subject to the
        deepest-level extent cap, re-checked per call."""
        from medicaldetectiontoolkit_tpu.parallel import mesh as pmesh

        n_d = n_data or getattr(self.cf, "n_data_parallel", None) or 1
        n_s = n_space or getattr(self.cf, "n_space_parallel", None) or 1
        mesh = pmesh.get_mesh_2d(n_d, n_s)
        self._predict_fn = pmesh.make_spatial_predict(self, mesh)
        if self.logger is not None:
            self.logger.info(f"spatially-partitioned inference over {n_d}x{n_s} (data x space) devices")
        return mesh

    def enable_data_parallel_inference(self, n_devices=None):
        """Shard the jitted predict fn over a device mesh (batch on axis 0,
        params replicated). Per-element outputs match the single-device path
        up to float reduction order (~1e-6); batch size must divide by the
        mesh size (the predictor pads chunks to cf.batch_size, so configure
        batch_size as a multiple of the mesh)."""
        from medicaldetectiontoolkit_tpu.parallel import mesh as pmesh

        n = n_devices or getattr(self.cf, "n_data_parallel", None)
        mesh = getattr(self, "_mesh", None) or pmesh.get_mesh(n)
        self._mesh = mesh
        self._predict_fn = pmesh.make_data_parallel_predict(self, mesh)
        if self.logger is not None:
            self.logger.info(f"data-parallel inference over {len(mesh.devices.ravel())} devices")
        return mesh

    def __init__(self, cf, logger):
        self.cf = cf
        self.logger = logger
        self.params = None
        self.opt_state = None
        self._optimizer = make_optimizer(cf)
        self.build()

    # ---- subclass API -------------------------------------------------
    def build(self):
        raise NotImplementedError

    def init_params(self, seed: int = 0):
        raise NotImplementedError

    # ---- state handling ------------------------------------------------
    def initialize(self, seed: Optional[int] = None):
        self.params = self.init_params(self.cf.seed if seed is None else seed)
        self.opt_state = self._optimizer.init(self.params)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        if self.logger is not None:
            self.logger.info(f"initialized {type(self).__name__} with {n_params/1e6:.2f}M parameters")

    def state_dict(self):
        return {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
        }

    def load_state_dict(self, state):
        self.params = jax.device_put(state["params"])
        if state.get("opt_state") is not None:
            self.opt_state = jax.device_put(state["opt_state"])

    def load_params(self, params):
        self.params = jax.device_put(params)
