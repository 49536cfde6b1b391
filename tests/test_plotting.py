"""Plotting smoke tests: every artifact renders and lands on disk."""

import os

import numpy as np

from medicaldetectiontoolkit_tpu import plotting


class _Cf:
    def __init__(self, tmp, dim=2):
        self.plot_dir = str(tmp)
        self.fold = 0
        self.fold_dir = str(tmp)
        self.dim = dim
        self.num_seg_classes = 2
        self.do_validation = True
        self.assign_values_to_extra_figure = {}
        self.n_monitoring_figures = 1
        self.num_epochs = 3
        self.box_color_palette = {
            "det": "b", "gt": "r", "neg_class": "purple", "prop": "w",
            "pos_class": "g", "pos_anchor": "c", "neg_anchor": "c",
        }


def _results(bsz, spatial):
    boxes = [
        [
            {"box_coords": np.array([5, 5, 20, 20]), "box_score": 0.9, "box_type": "det", "box_pred_class_id": 1},
            {"box_coords": np.array([4, 4, 21, 21]), "box_label": 1, "box_type": "gt"},
            {"box_coords": np.array([10, 10, 15, 15]), "box_type": "pos_anchor"},
        ]
        for _ in range(bsz)
    ]
    return {"boxes": boxes, "seg_preds": np.zeros((bsz, 1) + spatial, np.uint8)}


def test_plot_batch_prediction_2d(tmp_path):
    cf = _Cf(tmp_path)
    batch = {
        "data": np.random.rand(2, 1, 64, 64).astype(np.float32),
        "seg": np.zeros((2, 1, 64, 64), np.uint8),
        "pid": ["a", "b"],
    }
    out = os.path.join(str(tmp_path), "pred.png")
    plotting.plot_batch_prediction(batch, _results(2, (64, 64)), cf, outfile=out)
    assert os.path.isfile(out)


def test_plot_batch_prediction_3d(tmp_path):
    cf = _Cf(tmp_path, dim=3)
    batch = {
        "data": np.random.rand(1, 1, 32, 32, 8).astype(np.float32),
        "seg": np.zeros((1, 1, 32, 32, 8), np.uint8),
        "pid": ["p0"],
    }
    results = {
        "boxes": [[
            {"box_coords": np.array([5, 5, 20, 20, 2, 6]), "box_score": 0.8, "box_type": "det", "box_pred_class_id": 1},
            {"box_coords": np.array([5, 5, 20, 20, 2, 6]), "box_label": 1, "box_type": "gt"},
        ]],
        "seg_preds": np.zeros((1, 1, 32, 32, 8), np.uint8),
    }
    out = os.path.join(str(tmp_path), "pred3d.png")
    plotting.plot_batch_prediction(batch, results, cf, outfile=out)
    assert os.path.isfile(out)


def test_training_plot_updates(tmp_path):
    cf = _Cf(tmp_path)
    plot = plotting.TrainingPlot2Panel(cf)
    metrics = {
        "train": {"benign_ap": [None, 0.1, 0.2], "monitor_values": [[], [{"loss": 1.0}], [{"loss": 0.8}], []]},
        "val": {"benign_ap": [None, 0.2, 0.3], "monitor_values": [[], [{"loss": 0.9}], [{"loss": 0.7}], []]},
    }
    plot.update_and_save(metrics, epoch=2)
    assert os.path.isfile(os.path.join(str(tmp_path), "monitor_0_0.png"))


def test_prediction_hist(tmp_path):
    out = os.path.join(str(tmp_path), "hist")
    plotting.plot_prediction_hist([1, 0, 1, 0], [0.9, 0.2, 0.0, 0.7], ["det_tp", "det_fp", "det_fn", "det_fp"], out)
    assert os.path.isfile(out + ".png")


def test_stat_curves(tmp_path):
    out = os.path.join(str(tmp_path), "curves")
    stats = [{"name": "c1", "roc": ([0, 0.5, 1], [0, 0.8, 1], None), "prc": ([1, 0.7], [0, 1], None)}]
    plotting.plot_stat_curves(stats, out)
    assert os.path.isfile(out + "_roc.png")
    assert os.path.isfile(out + "_prc.png")
