#!/usr/bin/env python
"""Ablation timing of the LIDC 3D train step: where do the milliseconds go?

Times isolated pieces (backbone fwd, fwd+bwd, full step, detection refine)
at the bench geometry so layout/fusion work can be targeted with evidence.
Run on the chip: `python tools/ablate.py [variant ...]`. Variants:

  full        full jitted train step (fw+bw+adam+anchor matching+losses)
  fwd         predict forward (backbone + heads)
  bb_fwd      backbone forward only
  bb_bwd      backbone forward+backward (grad wrt params of a sum)
  heads       heads on frozen random feature maps
  detect      detection refinement (box decode + NMS + top-k)

Env: MDT_ABLATE_BATCH (4), MDT_ABLATE_STEPS (10), MDT_ABLATE_SF (18 start
filts), MDT_ABLATE_DTYPE (bfloat16), MDT_ABLATE_REMAT (auto).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn, *args, n=None, name=""):
    """Time fn; fn MUST consume a per-call int32 iteration scalar.

    The TPU runtime memoizes executions whose input buffers are bit-identical
    to a previous call (a same-inputs timing loop measures dispatch, not
    compute — burned us in round 2). Every timed fn therefore takes a
    trailing iteration scalar it must MIX into the computation.
    """
    import jax
    import jax.numpy as jnp

    n = n or int(os.environ.get("MDT_ABLATE_STEPS", 10))
    out = fn(*args, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args, jnp.int32(1))
    jax.block_until_ready(out)
    t_second = time.perf_counter() - t0  # post-compile single step
    t0 = time.perf_counter()
    for k in range(n):
        out = fn(*args, jnp.int32(2 + k))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>12}: {dt * 1e3:8.1f} ms/step   (single warm: {t_second * 1e3:.1f} ms)", flush=True)
    return dt


def _mix(x, i):
    """Make the input VALUE genuinely different per call.

    The TPU runtime elides executions whose inputs are bit-identical to a
    previous call (content-addressed: additive epsilons that round away do
    NOT defeat it — burned us twice in round 2). A 1e-3 relative scale is
    numerically irrelevant for timing purposes but forces real execution.

    CAUTION: NOT sufficient for conv-dominated probes — XLA hoists the
    scalar multiply across convolutions (conv(s*x) -> s*conv(x)), so the
    conv fragment's inputs stay bit-identical and its execution is elided
    (tools/convprobe.py found this; `fwd` read 0.2 ms/step that way).
    Conv probes must chain a data-dependent mixer instead (`_timed_chain`)."""
    return x * (1.0 + i.astype(x.dtype) * x.dtype.type(1e-3))


def _timed_chain(fn, *args, n=None, name="", floor_ms=None):
    """Like _timed, but the LAST arg is an input tensor that the probe
    threads through the computation: ``fn(*args)`` must return ``(out,
    x_next)`` where ``x_next`` is a fresh same-shaped tensor derived from the
    outputs (convprobe.py's pattern). Two weaker schemes both FAILED on
    hardware: a scalar multiply mixer (hoisted across convs, round-4
    ab_fwd_chain) and a single-element in-place set (round-5 ab_fwd2, still
    0.1 ms) — only a genuinely NEW full input buffer per call defeats the
    runtime's execution elision.

    ``floor_ms`` is an elision tripwire: a full-program fragment (whole
    forward, whole backbone backward) physically cannot run in under a few
    ms at this geometry, so a reading below the floor means the runtime
    elided the execution and the number is dispatch time, not compute. Such
    variants are flagged and the process exits nonzero."""
    import jax
    import jax.numpy as jnp

    n = n or int(os.environ.get("MDT_ABLATE_STEPS", 10))
    out, x = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out, x = fn(*args[:-1], x)
    jax.block_until_ready(out)
    t_second = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out, x = fn(*args[:-1], x)
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    flag = ""
    if floor_ms is not None and dt * 1e3 < floor_ms:
        flag = f"   ** ELIDED (< {floor_ms} ms sanity floor) — number INVALID **"
        _FLOOR_FAILURES.append(name)
    print(
        f"{name:>12}: {dt * 1e3:8.1f} ms/step   (single warm: {t_second * 1e3:.1f} ms){flag}",
        flush=True,
    )
    return dt


_FLOOR_FAILURES = []


def _chain_next(x, s):
    """Fresh next-call input: multiply the WHOLE buffer by a factor in
    [1 + 2^-7, 1 + 2^-6] derived from this call's output scalar. Why this
    exact shape (two weaker schemes failed on hardware):

    - the factor is applied in the PREVIOUS execution, so no algebraic
      rewrite of THIS program can factor it out — the input buffer itself is
      bit-different per call;
    - the relative change exceeds bf16's 2^-8 resolution near 1.0, so
      ``x * factor != x`` bitwise (a 1e-3 factor rounds back to x, the
      round-5 ab_fwd2 failure: the corner-set's effect on the f32 logit sum
      rounded away, reaching a bit-identical fixed point);
    - drift over 10-20 timed steps is bounded (< 1.2x), no overflow.
    Computed inside the jitted fn so the loop never syncs the big tensor."""
    import jax.numpy as jnp

    frac = (s.astype(jnp.float32) - jnp.floor(s.astype(jnp.float32)))
    factor = (1.0 + 2.0 ** -7 * (1.0 + frac)).astype(x.dtype)
    return x * factor


def main(variants):
    import jax
    import jax.numpy as jnp

    from medicaldetectiontoolkit_tpu.models import base as model_base
    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.testing import make_batch, make_config

    class _Log:
        def info(self, *a, **k):
            pass

    model = os.environ.get("MDT_ABLATE_MODEL", "retina_unet")
    bs = int(os.environ.get("MDT_ABLATE_BATCH", 4))
    sf = int(os.environ.get("MDT_ABLATE_SF", 18))
    patch = [int(v) for v in os.environ.get("MDT_ABLATE_PATCH", "128,128,64").split(",")]
    cf = make_config(
        model=model, dim=3, patch_size=patch,
        start_filts=sf, end_filts=sf * 2, batch_size=bs,
        # mrcnn/ufrcnn RPN heads emit 3 anchors/position (plain scales);
        # only the retina family uses the 2^(1/3) triplets (9/position)
        retina_scales=model in ("retina_net", "retina_unet"),
    )
    cf.n_rpn_features = 64
    cf.pre_nms_limit = 50000
    cf.model_max_instances_per_batch_element = 30
    cf.rpn_train_anchors_per_image = 300
    if model == "mrcnn":
        # the LIDC 3D mrcnn settings (experiments/lidc_exp/configs.py) so the
        # ablation times the same second-stage the conv3d runs pay for
        cf.rpn_train_anchors_per_image = 6
        cf.train_rois_per_image = 6
        cf.pre_nms_limit = 6000
        cf.roi_chunk_size = 600
        cf.post_nms_rois_training = 75
        cf.post_nms_rois_inference = 500
    cf.compute_dtype = os.environ.get("MDT_ABLATE_DTYPE", "bfloat16")
    if os.environ.get("MDT_ABLATE_REMAT"):
        cf.use_remat = os.environ["MDT_ABLATE_REMAT"] == "1"
    if os.environ.get("MDT_GRAD_ACCUM"):
        cf.grad_accum_steps = int(os.environ["MDT_GRAD_ACCUM"])

    net = build_model(cf, _Log())
    net.initialize(seed=0)
    batch = make_batch(cf)
    prep = net._prep(batch)  # family-specific device-input tuple
    img, gt_boxes, gt_ids, gt_valid = prep[0], prep[1], prep[2], prep[3]
    seg = prep[-1]
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-4)
    params, opt_state = net.params, net.opt_state

    print(f"model={model} batch={bs} sf={sf} dtype={cf.compute_dtype} remat={cf.use_remat}", flush=True)

    if model != "retina_unet":
        # the drill-down variants wire retina-family internals (_predict
        # heads, _finalize_outputs_jit, _losses_and_outputs signatures)
        allowed = {"full", "bb_fwd", "bb_bwd", "adam"}
        dropped = [v for v in variants if v not in allowed]
        if dropped:
            print(f"(model={model}: skipping retina-only variants {dropped})", flush=True)
        variants = [v for v in variants if v in allowed]

    if "full" in variants:
        state = {"p": params, "o": opt_state}  # the step donates both buffers

        def full(i):
            out = net._train_step_fn(state["p"], state["o"], jax.random.fold_in(rng, i),
                                     lr, *prep)
            state["p"], state["o"] = out[0], out[1]
            return out[2]["loss"]

        _timed(full, name="full")
        params, opt_state = state["p"], state["o"]

    if "fwd" in variants:
        @jax.jit
        def fwd(p, x):
            heads = net._predict(p, x)
            # reduce over ALL heads: returning only the class logits lets XLA
            # dead-code-eliminate the bb-delta and seg branches
            s = sum(jnp.sum(h.astype(jnp.float32)) for h in heads)
            return s, _chain_next(x, s)

        _timed_chain(fwd, params, img, name="fwd", floor_ms=5.0)

    if "bb_fwd" in variants or "bb_bwd" in variants:
        from medicaldetectiontoolkit_tpu.models import base as mbase
        from medicaldetectiontoolkit_tpu.models.backbone import FPN

        fpn = FPN(
            dim=cf.dim, n_channels=cf.n_channels, start_filts=cf.start_filts,
            end_filts=cf.end_filts, res_architecture=cf.res_architecture,
            norm=cf.norm, relu=cf.relu, sixth_pooling=cf.sixth_pooling,
            operate_stride1=True, weight_init=cf.weight_init,
            dtype=jnp.bfloat16 if cf.compute_dtype == "bfloat16" else jnp.float32,
            remat=mbase.resolve_remat(cf),
        )
        fpn_params = jax.jit(fpn.init)(jax.random.PRNGKey(0), img)["params"]

        if "bb_fwd" in variants:
            @jax.jit
            def bb(p, x):
                outs = fpn.apply({"params": p}, x)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return s, _chain_next(x, s)

            _timed_chain(bb, fpn_params, img, name="bb_fwd", floor_ms=5.0)

        if "bb_bwd" in variants:
            def bb_loss(p, x):
                return sum(jnp.sum(o.astype(jnp.float32)) for o in fpn.apply({"params": p}, x))

            @jax.jit
            def bbg(p, x):
                g = jax.grad(bb_loss)(p, x)
                # reduce over ALL leaves: returning a single leaf lets XLA
                # dead-code-eliminate the other gradients (partial backward)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(g))
                return s, _chain_next(x, s)

            _timed_chain(bbg, fpn_params, img, name="bb_bwd", floor_ms=5.0)

    if "detect" in variants:
        heads = net._predict_fn(params, img)
        jax.block_until_ready(heads[0])
        det = jax.jit(lambda h0, rest, i: net._finalize_outputs_jit(_mix(h0, i), *rest))
        _timed(det, heads[0], heads[1:], name="detect")

    if "loss_fwd" in variants:
        lf = jax.jit(
            lambda p, r, i: net._losses_and_outputs(p, jax.random.fold_in(r, i), img, gt_boxes, gt_ids, gt_valid, seg)[0]
        )
        _timed(lf, params, rng, name="loss_fwd")

    if "loss_bwd" in variants:
        lb = jax.jit(
            lambda p, r, i: jax.grad(
                lambda q: net._losses_and_outputs(q, jax.random.fold_in(r, i), img, gt_boxes, gt_ids, gt_valid, seg)[0]
            )(p)
        )
        _timed(lb, params, rng, name="loss_bwd")

    if "match" in variants:
        # anchor matching + target building alone (no network)
        from medicaldetectiontoolkit_tpu.ops import matching as match_ops

        neg_iou = 0.1 if cf.dim == 2 else 0.01
        std = jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32)

        def run_match(r, gb, gi, gv, it):
            r = jax.random.fold_in(r, it)
            rngs = jax.random.split(r, gb.shape[0])
            return jax.vmap(
                lambda rr, b, i, v: match_ops.gt_anchor_matching(
                    rr, net.anchors, b, i, v, cf.anchor_matching_iou, neg_iou,
                    cf.rpn_train_anchors_per_image, std,
                )
            )(rngs, gb, gi, gv)

        m = jax.jit(run_match)
        _timed(m, rng, gt_boxes, gt_ids, gt_valid, name="match")

    if "seg" in variants:
        from medicaldetectiontoolkit_tpu.ops import losses as loss_ops

        fake_logits = jnp.zeros(img.shape[:-1] + (cf.num_seg_classes,), jnp.float32)

        def seg_loss(logits, s):
            logits_cf = jnp.moveaxis(logits, -1, 1)
            probs = jax.nn.softmax(logits_cf, axis=1)
            onehot = loss_ops.one_hot_channels(s, cf.num_seg_classes)
            return (1.0 - loss_ops.batch_dice(probs, onehot)) + loss_ops.weighted_ce(logits_cf, s)

        sl = jax.jit(lambda lg, s, i: jax.value_and_grad(seg_loss)(_mix(lg, i), s))
        _timed(sl, fake_logits, seg, name="seg")

    if "adam" in variants:
        grads = jax.tree_util.tree_map(jnp.ones_like, params)

        def adam(g, o, p, i):
            g = jax.tree_util.tree_map(lambda a: _mix(a, i), g)
            upd, o2 = net._optimizer.update(g, o, p)
            upd = jax.tree_util.tree_map(lambda u: u * lr, upd)
            return jax.tree_util.tree_map(lambda a, u: a + u, p, upd), o2

        ad = jax.jit(adam)
        _timed(ad, grads, opt_state, params, name="adam")


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "fwd", "bb_fwd", "bb_bwd", "detect"])
    if _FLOOR_FAILURES:
        print(f"ELIDED VARIANTS (numbers invalid): {_FLOOR_FAILURES}", flush=True)
        sys.exit(3)
