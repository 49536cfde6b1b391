"""Default configuration: the base attribute bag every layer reads.

Same layered-Python-config design as the reference (``default_configs.py:21-139``
<- per-experiment ``configs(server_env)`` subclass <- CLI flag mutation):
configs are code, carry ~100 attributes with the same names, and compute
derived geometry (backbone shapes, anchors, windows) in model-specific
``add_*_configs`` methods supplied by the experiment.

TPU-specific additions live at the bottom: compute dtype, static padding
maxima (JAX needs fixed shapes where torch used dynamic ones), and mesh/data
parallel settings.
"""

from __future__ import annotations

import os


class DefaultConfigs:
    def __init__(self, model, server_env=None, dim=2):
        #########################
        #         I/O           #
        #########################
        self.model = model
        self.dim = dim
        self.select_prototype_subset = None

        self.source_dir = os.path.dirname(os.path.realpath(__file__))
        self.input_df_name = "info_df.pickle"
        # kept for snapshot compatibility; models resolve via registry
        self.model_path = f"medicaldetectiontoolkit_tpu/models/{model}.py"
        self.backbone_path = "medicaldetectiontoolkit_tpu/models/backbone.py"

        #########################
        #      Data Loader      #
        #########################
        # random seed for fold_generator and batch_generator
        self.seed = 0
        # number of worker threads for host-side batch generation
        self.n_workers = 16 if server_env else 8
        self.class_specific_seg_flag = False

        #########################
        #      Architecture     #
        #########################
        self.weight_decay = 0.0
        self.relu = "relu"  # 'relu' | 'leaky_relu'
        self.custom_init = False
        self.weight_init = None
        self.norm = None  # None | 'instance_norm' | 'batch_norm'
        # adds high-res decoder levels P1 + P0 to the FPN
        self.operate_stride1 = False

        #########################
        #       Schedule        #
        #########################
        self.n_cv_splits = 5
        self.n_probabilistic_samples = None

        #########################
        #   Testing / Plotting  #
        #########################
        # mirror TTA (xy only)
        self.test_aug = True
        self.hold_out_test_set = False
        self.ensemble_folds = False
        self.box_color_palette = {
            "det": "b",
            "gt": "r",
            "neg_class": "purple",
            "prop": "w",
            "pos_class": "g",
            "pos_anchor": "c",
            "neg_anchor": "c",
        }
        self.scan_det_thresh = False
        self.plot_stat_curves = False
        self.per_patient_ap = False
        # IoU for clustering 2D predictions into 3D cubes (xy overlap)
        self.merge_3D_iou = 0.1
        self.n_monitoring_figures = 1
        self.assign_values_to_extra_figure = {}
        self.save_preds_to_csv = True
        self.max_test_patients = "all"

        #########################
        #        MRCNN          #
        #########################
        self.frcnn_mode = False
        self.return_masks_in_val = False
        self.return_masks_in_test = False
        self.sixth_pooling = False
        self.n_latent_dims = 0

        #########################
        #     TPU-specific      #
        #########################
        # static padding maximum for GT boxes per batch element (masked)
        self.max_gt_boxes = 32
        # static padding maximum for GT masks (None = same as max_gt_boxes).
        # Set lower to bound HBM in full-res 3D: each slot costs |spatial|
        # bytes per element; positives assigned to a GT past the cap simply
        # get no mask supervision (they keep class/bbox supervision).
        self.max_gt_masks = None
        # compute dtype for the conv stack ('float32' | 'bfloat16');
        # losses/box math stay float32
        self.compute_dtype = "float32"
        # rematerialize backbone activations in the backward pass.
        # None = auto (on for 3D, off for 2D); 3D volumes at training batch
        # sizes do not fit HBM without it.
        self.use_remat = None
        # capture a jax.profiler trace of a few steps of the first epoch into
        # exp_dir/profile (inspect with TensorBoard / xprof)
        self.profile = False
        # data-parallel devices; None = all visible. MDT_DP overrides for
        # scripted runs (chip queue / multi-host launches).
        self.n_data_parallel = (
            int(os.environ["MDT_DP"]) if os.environ.get("MDT_DP") else None
        )
        # spatial ('space' mesh axis) shards of the image Y axis for training
        # AND the data-parallel factor alongside it; > 1 builds the 2D
        # (n_data_parallel x n_space_parallel) mesh and spatially partitions
        # the train step (parallel.mesh.make_spatial_train_step) — for
        # patches whose activations exceed one device's HBM. Subject to the
        # deepest-pyramid-level extent cap. MDT_SP overrides.
        self.n_space_parallel = (
            int(os.environ["MDT_SP"]) if os.environ.get("MDT_SP") else None
        )
        # gradient accumulation: microbatches per optimizer step, scanned
        # inside ONE jitted train step (models/base.accum_value_and_grad).
        # With remat (the 3D default) live activations shrink to one
        # microbatch, so the reference's effective batch (8 at LIDC 3D)
        # fits HBM that OOMs on the monolithic batch. batch_size must be
        # divisible (indivisible batches round the accumulation DOWN to the
        # largest divisor, so --dev-shrunken runs keep training). Batch-global
        # loss reductions (batch dice, SHEM pools)
        # see one microbatch at a time — same as the reference at the
        # smaller physical batch. MDT_GRAD_ACCUM overrides.
        self.grad_accum_steps = int(os.environ.get("MDT_GRAD_ACCUM", "1") or 1)

        # how backbone identity blocks execute: "unroll" (nn.scan fully
        # unrolled, stacked params), "scan" (rolled), or "loop" (plain Python
        # loop, per-block param subtrees — no stacked axis, so the backward
        # pass has no per-block dynamic-update-slice/relayout copies; ~25
        # copy.* ops at 1.3-2.3 ms each in the round-4 trace). Trace/param
        # names differ between loop and scan/unroll, so checkpoints are not
        # interchangeable across modes.
        self.stage_mode = os.environ.get("MDT_STAGE_MODE", "unroll")
