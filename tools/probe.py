#!/usr/bin/env python
"""Evidence probes for the LIDC 3D train-step optimization (round 2).

Each probe is cheap and chip-runnable:
  cost      XLA cost_analysis + memory_analysis of the full train step and
            the backbone fwd+bwd: FLOPs, bytes, peak HBM -> utilization.
  noremat   backbone fwd+bwd without rematerialization.
  match2    matching without top_k subsample / without rng (isolate cost).
  seg2      fused channel-last seg loss (no one-hot, no moveaxis) vs current.
  slim      full train step WITHOUT returning head logits (monitor scalars
            + argmax seg only) - tests the cost of materializing outputs.

Run: python tools/probe.py cost noremat match2 seg2 [...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn, *args, n=10, name=""):
    """fn must take a trailing per-call int32 scalar and mix it in: the TPU
    runtime memoizes executions with bit-identical input buffers, so a
    same-inputs loop measures dispatch, not compute."""
    import jax
    import jax.numpy as jnp

    out = fn(*args, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(n):
        out = fn(*args, jnp.int32(1 + k))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>14}: {dt * 1e3:8.1f} ms/step", flush=True)
    return dt


def _mix(x, i):
    # inputs must be VALUE-different per call: the runtime elides executions
    # on bit-identical inputs (epsilons that round away do not defeat it)
    return x * (1.0 + i.astype(x.dtype) * x.dtype.type(1e-3))


def main(variants):
    import jax
    import jax.numpy as jnp

    from medicaldetectiontoolkit_tpu.models import base as model_base
    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.testing import make_batch, make_config

    class _Log:
        def info(self, *a, **k):
            pass

    bs = int(os.environ.get("MDT_ABLATE_BATCH", 4))
    sf = int(os.environ.get("MDT_ABLATE_SF", 18))
    cf = make_config(
        model="retina_unet", dim=3,
        patch_size=[int(v) for v in os.environ.get("MDT_ABLATE_PATCH", "128,128,64").split(",")],
        start_filts=sf, end_filts=sf * 2, batch_size=bs,
    )
    cf.n_rpn_features = 64
    cf.pre_nms_limit = 50000
    cf.model_max_instances_per_batch_element = 30
    cf.rpn_train_anchors_per_image = 300
    cf.compute_dtype = os.environ.get("MDT_ABLATE_DTYPE", "bfloat16")

    net = build_model(cf, _Log())
    net.initialize(seed=0)
    batch = make_batch(cf)
    img = model_base.image_to_device(batch["data"])
    gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
        batch["bb_target"], batch["roi_labels"], img.shape[0], cf.dim, cf.max_gt_boxes
    )
    seg = model_base.seg_to_device(batch["seg"])
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-4)
    params, opt_state = net.params, net.opt_state
    print(f"batch={bs} sf={sf} dtype={cf.compute_dtype} remat={cf.use_remat} "
          f"anchors={net.anchors.shape}", flush=True)

    if "cost" in variants:
        lowered = jax.jit(net._train_step, donate_argnums=(0, 1)).lower(
            params, opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, seg)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bta = ca.get("bytes accessed", float("nan"))
        print(f"full step: flops={flops/1e12:.2f}T bytes={bta/1e9:.2f}GB")
        try:
            ma = comp.memory_analysis()
            print(f"  peak HBM: temps={ma.temp_size_in_bytes/1e9:.2f}GB "
                  f"args={ma.argument_size_in_bytes/1e9:.2f}GB "
                  f"out={ma.output_size_in_bytes/1e9:.2f}GB")
        except Exception as e:
            print("  memory_analysis unavailable:", e)
        # utilization at measured 630 ms
        print(f"  bf16 peak v5e=197T -> util at 630ms: {flops/1e12/0.63/197*100:.1f}%")
        print(f"  HBM 819GB/s -> bandwidth time: {bta/819e9*1e3:.0f} ms")

    if "noremat" in variants or "remat" in variants:
        from medicaldetectiontoolkit_tpu.models import base as mbase
        from medicaldetectiontoolkit_tpu.models.backbone import FPN

        stage_mode = os.environ.get("MDT_STAGE_MODE", "unroll")
        for use_remat in ([False, True] if "remat" in variants else [False]):
            fpn = FPN(
                dim=cf.dim, n_channels=cf.n_channels, start_filts=cf.start_filts,
                end_filts=cf.end_filts, res_architecture=cf.res_architecture,
                norm=cf.norm, relu=cf.relu, sixth_pooling=cf.sixth_pooling,
                operate_stride1=True, weight_init=cf.weight_init,
                dtype=jnp.bfloat16 if cf.compute_dtype == "bfloat16" else jnp.float32,
                remat=use_remat, stage_mode=stage_mode,
            )
            fpn_params = jax.jit(fpn.init)(jax.random.PRNGKey(0), img)["params"]

            def bb_loss(p, x):
                return sum(jnp.sum(o.astype(jnp.float32)) for o in fpn.apply({"params": p}, x))

            bbg = jax.jit(lambda p, x, i: jax.grad(bb_loss)(p, _mix(x, i)))
            lowered = bbg.lower(fpn_params, img, jax.numpy.int32(0))
            comp = lowered.compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f"bb_bwd remat={use_remat}: flops={ca.get('flops', 0)/1e12:.2f}T "
                  f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB", flush=True)
            try:
                ma = comp.memory_analysis()
                print(f"  peak temps={ma.temp_size_in_bytes/1e9:.2f}GB")
            except Exception:
                pass
            _timed(bbg, fpn_params, img, name=f"bb_bwd_remat{int(use_remat)}")

    if "match2" in variants:
        from medicaldetectiontoolkit_tpu.ops import matching as match_ops
        from medicaldetectiontoolkit_tpu.ops import boxes as box_ops

        neg_iou = 0.01
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

        _timed(jax.jit(run_match), rng, gt_boxes, gt_ids, gt_valid, name="match_base")

        # IoU + argmax/max only
        def iou_only(gb, gv, it):
            gb = _mix(gb, it)
            def one(b, v):
                ov = box_ops.pairwise_iou(net.anchors, b)
                ov = jnp.where(v[None, :], ov, -1.0)
                return jnp.argmax(ov, 1), jnp.max(ov, 1), jnp.argmax(ov, 0)
            return jax.vmap(one)(gb, gv)

        _timed(jax.jit(iou_only), gt_boxes, gt_valid, name="match_iou")

        # rng + topk subsample only
        A = net.anchors.shape[0]

        def sub_only(r, it):
            r = jax.random.fold_in(r, it)
            def one(rr):
                rand = jax.random.uniform(rr, (A,))
                vals, idx = jax.lax.top_k(-rand, 150)
                return idx
            return jax.vmap(one)(jax.random.split(r, bs))

        _timed(jax.jit(sub_only), rng, name="match_topk")

        # deltas only
        def deltas_only(gb, it):
            gb = _mix(gb, it)
            def one(b):
                tg = b[jnp.zeros((A,), jnp.int32)]
                return box_ops.box_refinement(net.anchors.astype(jnp.float32), tg) / std
            return jax.vmap(one)(gb)

        _timed(jax.jit(deltas_only), gt_boxes, name="match_deltas")

    if "seg2" in variants:
        from medicaldetectiontoolkit_tpu.ops import losses as loss_ops

        nsc = cf.num_seg_classes
        fake_logits = jnp.zeros(img.shape[:-1] + (nsc,), jnp.float32)

        def seg_loss_now(logits, s):
            logits_cf = jnp.moveaxis(logits, -1, 1)
            probs = jax.nn.softmax(logits_cf, axis=1)
            onehot = loss_ops.one_hot_channels(s, nsc)
            return (1.0 - loss_ops.batch_dice(probs, onehot)) + loss_ops.weighted_ce(logits_cf, s)

        _timed(jax.jit(lambda lg, s, i: jax.value_and_grad(seg_loss_now)(_mix(lg, i), s)),
               fake_logits, seg, name="seg_now")

        def seg_loss_fused(logits, s):
            # channel-last throughout; no one-hot/moveaxis materialization
            lab = s[:, 0].astype(jnp.int32)  # (b, *sp)
            probs = jax.nn.softmax(logits, axis=-1)  # (b, *sp, C)
            lse = jax.nn.logsumexp(logits, axis=-1)
            lg_y = jnp.take_along_axis(logits, lab[..., None], axis=-1)[..., 0]
            ce = jnp.mean(lse - lg_y)
            cnt = []
            inter = []
            psum = []
            for c in range(nsc):
                m = (lab == c).astype(logits.dtype)
                inter.append(jnp.sum(probs[..., c] * m))
                psum.append(jnp.sum(probs[..., c]))
                cnt.append(jnp.sum(m))
            inter = jnp.stack(inter)
            denom = jnp.stack(psum) + jnp.stack(cnt)
            dice = (2 * inter + 1e-6) / (denom + 1e-6)
            return (1.0 - jnp.mean(dice[1:])) + ce

        _timed(jax.jit(lambda lg, s, i: jax.value_and_grad(seg_loss_fused)(_mix(lg, i), s)),
               fake_logits, seg, name="seg_fused")

        # bf16 logits variant
        fake_bf = fake_logits.astype(jnp.bfloat16)
        _timed(jax.jit(lambda lg, s, i: jax.value_and_grad(
            lambda l, ss: seg_loss_fused(l.astype(jnp.float32), ss))(_mix(lg, i), s)),
               fake_bf, seg, name="seg_fused_bf16")

    if "slim" in variants:
        # train step that only returns params/opt/monitor (no head logits out)
        def slim_step(p, o, r, lrv, im, gb, gi, gv, sg):
            out = net._train_step(p, o, r, lrv, im, gb, gi, gv, sg)
            return out[0], out[1], out[2]

        slim = jax.jit(slim_step, donate_argnums=(0, 1))
        state = {"p": params, "o": opt_state}

        def run(i):
            o = slim(state["p"], state["o"], jax.random.fold_in(rng, i), lr, img,
                     gt_boxes, gt_ids, gt_valid, seg)
            state["p"], state["o"] = o[0], o[1]
            return o[2]["loss"]

        _timed(run, name="full_slim")


if __name__ == "__main__":
    main(sys.argv[1:] or ["cost"])
