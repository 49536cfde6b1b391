"""Async dispatch/convert pipeline equality for the non-retina families.

The trainer's one-step-deep pipeline (exec.py: dispatch step i+1 before
converting step i) must be result-identical to the serial loop for every
detector that implements the dispatch/convert split. retina_net is covered
in tests/test_retina_net.py; this file pins mrcnn (dense two-stage convert
path) and detection_unet (host connected-components convert path).
"""

import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.testing import make_batch, make_config


class _Log:
    def info(self, *a, **k):
        pass

    def __getattr__(self, name):
        return self.info


@pytest.mark.parametrize("model", ["mrcnn", "detection_unet"])
def test_pipelined_dispatch_matches_serial(model):
    cf = make_config(model=model, dim=2, batch_size=2, retina_scales=(model != "mrcnn"))
    batches = []
    for i in range(3):
        b = make_batch(cf, seed=42 + i)
        batches.append(b)

    def run(pipelined):
        import jax

        net = build_model(make_config(model=model, dim=2, batch_size=2,
                                      retina_scales=(model != "mrcnn")), _Log())
        net.initialize(seed=11)
        outs = []
        if pipelined:
            pending = None
            for b in batches:
                h = net.train_forward_dispatch(b)
                if pending is not None:
                    outs.append(net.train_forward_convert(*pending))
                pending = (h, b)
            outs.append(net.train_forward_convert(*pending))
        else:
            outs = [net.train_forward(b) for b in batches]
        return outs, jax.device_get(net.params)

    serial_outs, serial_params = run(False)
    pipe_outs, pipe_params = run(True)
    import jax

    for a, b in zip(serial_outs, pipe_outs):
        assert a["logger_string"] == b["logger_string"]
        assert len(a["boxes"]) == len(b["boxes"])
        np.testing.assert_array_equal(a["seg_preds"], b["seg_preds"])
    for pa, pb in zip(jax.tree_util.tree_leaves(serial_params), jax.tree_util.tree_leaves(pipe_params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.parametrize("model", ["mrcnn", "detection_unet"])
def test_val_tiling_pipeline_matches_serial_chunks(model, monkeypatch):
    """Predictor.batch_tiling_forward in val mode (pipelined dispatch via
    train_forward_dispatch(is_validation=True)) must equal a serial loop of
    train_forward(is_validation=True) over the same padded chunks."""
    from medicaldetectiontoolkit_tpu.predictor import Predictor

    monkeypatch.setenv("MDT_TILE_INFLIGHT", "3")
    n, bs = 5, 2

    def big_batch(cf):
        parts = [make_batch(cf, seed=100 + i) for i in range((n + bs - 1) // bs)]
        batch = {
            "data": np.concatenate([p["data"] for p in parts])[:n],
            "seg": np.concatenate([p["seg"] for p in parts])[:n],
            "class_target": np.concatenate([p["class_target"] for p in parts])[:n],
            "bb_target": [b for p in parts for b in p["bb_target"]][:n],
            "roi_labels": [l for p in parts for l in p["roi_labels"]][:n],
            "pid": ["0"] * n,
        }
        return batch

    def fresh_net():
        cf = make_config(model=model, dim=2, batch_size=bs, retina_scales=(model != "mrcnn"))
        net = build_model(cf, _Log())
        net.initialize(seed=23)
        return cf, net

    # pipelined val tiling (the shipped path)
    cf, net = fresh_net()
    batch = big_batch(cf)
    pred = Predictor(cf, net, _Log(), mode="val")
    got = pred.batch_tiling_forward(dict(batch))

    # serial reference: identical chunking/padding, plain train_forward
    cf2, net2 = fresh_net()
    batch2 = big_batch(cf2)
    chunk_dicts = []
    for start in range(0, n, bs):
        ixs = np.arange(start, min(start + bs, n))
        pad = bs - len(ixs)
        b = {k: batch2[k][ixs] for k in ("data", "seg", "class_target")}
        for k in ("bb_target", "roi_labels"):
            b[k] = [batch2[k][i] for i in ixs] + [batch2[k][ixs[-1]]] * pad
        if pad:
            b = {k: (np.concatenate([v, v[-1:].repeat(pad, axis=0)]) if isinstance(v, np.ndarray) else v)
                 for k, v in b.items()}
        d = net2.train_forward(b, is_validation=True)
        if pad:
            d["boxes"] = d["boxes"][: len(ixs)]
            d["seg_preds"] = d["seg_preds"][: len(ixs)]
        chunk_dicts.append(d)
    want_seg = np.array([s for d in chunk_dicts for s in d["seg_preds"]])
    want_boxes = [
        [bx for bx in bl if bx["box_type"] == "det"] for d in chunk_dicts for bl in d["boxes"]
    ]
    want_monitor = {
        k: np.mean([d["monitor_values"][k] for d in chunk_dicts])
        for k in chunk_dicts[0]["monitor_values"]
    }

    np.testing.assert_array_equal(got["seg_preds"], want_seg)
    assert len(got["boxes"]) == n
    for gb, wb in zip(got["boxes"], want_boxes):
        assert len(gb) == len(wb)
        for g, w in zip(gb, wb):
            np.testing.assert_allclose(g["box_coords"], w["box_coords"])
            np.testing.assert_allclose(g["box_score"], w["box_score"])
    for k, v in want_monitor.items():
        np.testing.assert_allclose(got["monitor_values"][k], v, rtol=1e-6)


@pytest.mark.parametrize("model", ["mrcnn", "retina_unet", "detection_unet"])
def test_lean_convert_matches_full(model):
    """need_seg_preds=False (the trainer's per-step monitoring path) must
    produce identical boxes + monitor values; only seg_preds may differ
    (None, except detection_unet whose boxes derive from the seg volume)."""
    cf = make_config(model=model, dim=2, batch_size=2,
                     retina_scales=(model not in ("mrcnn",)))
    net = build_model(cf, _Log())
    net.initialize(seed=3)
    batch = make_batch(cf, seed=7)

    handles = net.train_forward_dispatch(batch, is_validation=True)
    full = net.train_forward_convert(handles, batch, need_seg_preds=True)
    lean = net.train_forward_convert(handles, batch, need_seg_preds=False)

    assert lean["monitor_values"] == full["monitor_values"]
    assert lean["loss"] == full["loss"]
    assert repr(lean["boxes"]) == repr(full["boxes"])
    if model == "detection_unet":
        np.testing.assert_array_equal(lean["seg_preds"], full["seg_preds"])
    else:
        # lean convert keeps the (b,1,*sp) shape contract with a cheap
        # host-side zero volume instead of pulling the device seg output
        assert lean["seg_preds"].shape == full["seg_preds"].shape
        assert not lean["seg_preds"].any()
