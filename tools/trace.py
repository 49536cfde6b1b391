#!/usr/bin/env python
"""Capture a jax.profiler trace of the LIDC 3D train step and print top ops.

Usage: python tools/trace.py [full|fwd|bb_bwd] ...
Writes the xplane to /tmp/mdt_trace/<variant> and prints the top-40 HLO ops
by self time (parsed with tensorboard_plugin_profile), which is the evidence
for layout/fusion optimization work.
"""

import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(logdir, top=45, n_steps=3):
    """Aggregate device-lane op durations from the chrome trace json.

    (The tensorboard_plugin_profile xplane parser is broken in this image —
    TF/tbp version mismatch — so parse the trace.json.gz the TPU profiler
    also emits.)
    """
    import collections
    import gzip
    import json

    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print("no trace.json.gz found under", logdir)
        return
    data = json.load(gzip.open(sorted(traces)[-1], "rt"))
    events = data["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e["pid"], "")
            name = e["name"]
            # skip module-level wrapper + step-number grouping events
            if name.isdigit() or name.startswith("jit_"):
                continue
            if "TPU" in pname or "TensorCore" in pname:
                agg[name] += e["dur"]
                total += e["dur"]
    print(f"device total: {total/1e3/n_steps:.1f} ms/step ({len(agg)} op names)")
    for name, us in agg.most_common(top):
        print(f"  {us/1e3/n_steps:9.3f} ms/step  {name[:120]}")


def main(variants):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    for variant in variants:
        logdir = f"/tmp/mdt_trace/{variant}"
        os.makedirs(logdir, exist_ok=True)

        if variant == "full":
            state = {"p": net.params, "o": net.opt_state}

            def step():
                out = net._train_step_fn(state["p"], state["o"], rng, lr, img,
                                         gt_boxes, gt_ids, gt_valid, seg)
                state["p"], state["o"] = out[0], out[1]
                return out[2]["loss"]
        elif variant == "fwd":
            fwd = jax.jit(lambda p, x: net._predict(p, x))

            def step():
                return fwd(net.params, img)
        else:
            raise SystemExit(f"unknown variant {variant}")

        jax.block_until_ready(step())  # compile outside the trace
        jax.block_until_ready(step())
        jax.profiler.start_trace(logdir)
        for _ in range(3):
            out = step()
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        time.sleep(1)
        print(f"===== {variant} (3 steps traced) =====")
        parse_trace(logdir)


if __name__ == "__main__":
    main(sys.argv[1:] or ["full"])
