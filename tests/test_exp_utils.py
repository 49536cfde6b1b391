"""Experiment-utils tests: checkpoints, model selection, snapshots, CSV."""

import os
import pickle

import numpy as np
import pytest

import medicaldetectiontoolkit_tpu.utils.exp_utils as utils


class _Log:
    def info(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass


class _Net:
    def __init__(self):
        self.params = {"w": np.arange(4.0)}
        self.opt_state = {"m": np.zeros(4)}

    def state_dict(self):
        return {"params": self.params, "opt_state": self.opt_state}

    def load_state_dict(self, state):
        self.params = state["params"]
        self.opt_state = state.get("opt_state", self.opt_state)


class _Cf:
    def __init__(self, tmp):
        self.save_n_models = 2
        self.min_save_thresh = 0
        self.model_selection_criteria = ["benign_ap"]
        self.fold_dir = str(tmp)
        self.num_epochs = 5


def _metrics(vals):
    return {"val": {"benign_ap": [None] + list(vals)}, "train": {}}


class TestModelSelector:
    def test_topk_checkpoints_and_ranking(self, tmp_path):
        cf = _Cf(tmp_path)
        sel = utils.ModelSelector(cf, _Log())
        net = _Net()
        scores = [0.1, 0.5, 0.3, 0.7, 0.2]
        for epoch in range(1, 6):
            sel.run_model_selection(net, _metrics(scores[:epoch]), epoch)
        ranking = np.load(os.path.join(cf.fold_dir, "epoch_ranking.npy"))
        assert list(ranking) == [4, 2]  # epochs ranked by score desc, top-2
        kept = sorted(d for d in os.listdir(cf.fold_dir) if "best_checkpoint" in d)
        assert kept == ["2_best_checkpoint", "4_best_checkpoint"]
        assert os.path.isdir(os.path.join(cf.fold_dir, "last_checkpoint"))

    def test_no_validation_selects_on_train_metrics(self, tmp_path):
        # PET-CT setting: do_validation=False -> criteria read from the
        # train series so --mode test still has ranked checkpoints
        cf = _Cf(tmp_path)
        cf.do_validation = False
        sel = utils.ModelSelector(cf, _Log())
        net = _Net()
        scores = [0.2, 0.9, 0.4]
        for epoch in range(1, 4):
            metrics = {"val": {}, "train": {"benign_ap": [None] + scores[:epoch]}}
            sel.run_model_selection(net, metrics, epoch)
        ranking = np.load(os.path.join(cf.fold_dir, "epoch_ranking.npy"))
        assert list(ranking) == [2, 3]

    def test_resume_roundtrip(self, tmp_path):
        cf = _Cf(tmp_path)
        sel = utils.ModelSelector(cf, _Log())
        net = _Net()
        net.params = {"w": np.full(4, 3.25)}
        sel.run_model_selection(net, _metrics([0.4]), 1)
        net2 = _Net()
        start_epoch, metrics = utils.load_checkpoint(os.path.join(cf.fold_dir, "last_checkpoint"), net2)
        assert start_epoch == 2
        np.testing.assert_array_equal(net2.params["w"], 3.25)
        assert metrics["val"]["benign_ap"][-1] == 0.4


class TestPrepExp:
    def test_snapshot_and_reload(self, tmp_path):
        exp_dir = str(tmp_path / "exp")
        os.environ["MDT_TOY_ROOT"] = "/tmp/unused"
        os.environ["MDT_MODEL"] = "retina_net"
        cf = utils.prep_exp("experiments/toy_exp", exp_dir, use_stored_settings=False)
        assert os.path.isfile(os.path.join(exp_dir, "configs.py"))
        assert os.path.isfile(os.path.join(exp_dir, "default_configs.py"))
        assert os.path.isfile(os.path.join(exp_dir, "model.py"))
        assert os.path.isfile(os.path.join(exp_dir, "backbone.py"))
        assert os.path.isdir(cf.plot_dir)
        # stored-settings path re-imports from exp dir
        cf2 = utils.prep_exp("experiments/toy_exp", exp_dir, use_stored_settings=True)
        assert cf2.model == cf.model
        # inference path loads stored configs only
        cf3 = utils.prep_exp("experiments/toy_exp", exp_dir, is_training=False)
        assert cf3.exp_dir == exp_dir


class TestCsvOutput:
    def test_csv_written(self, tmp_path):
        class Cf:
            exp_dir = str(tmp_path)
            min_det_thresh = 0.1
            fold = 0

        results = [
            [[[{"box_type": "det", "box_coords": np.array([1, 2, 3, 4]), "box_score": 0.9, "box_pred_class_id": 1},
               {"box_type": "det", "box_coords": np.array([5, 6, 7, 8]), "box_score": 0.05, "box_pred_class_id": 2}]],
             "patient_0"],
        ]
        df = utils.create_csv_output(results, Cf(), _Log())
        assert len(df) == 1  # low-score prediction filtered
        out = os.path.join(str(tmp_path), "results_0.csv")
        assert os.path.isfile(out)


class TestMonitoring:
    def test_prepare_monitoring_structure(self, tmp_path):
        class Cf:
            report_score_level = ["patient", "rois"]
            class_dict = {1: "benign", 2: "malignant"}
            num_epochs = 3
            plot_dir = str(tmp_path)
            fold = 0
            fold_dir = str(tmp_path)
            do_validation = True
            assign_values_to_extra_figure = {}
            n_monitoring_figures = 1

        metrics, plot = utils.prepare_monitoring(Cf())
        assert "benign_ap" in metrics["train"] and "malignant_ap" in metrics["val"]
        assert "patient_auc" in metrics["val"]
        assert len(metrics["train"]["monitor_values"]) == 4


def test_snapshot_reimport_round_trip(tmp_path, monkeypatch):
    """--use_stored_settings / test mode must run the exp-dir SNAPSHOT of the
    model source, not the installed one (reference tmp_model mechanism)."""
    import sys
    import inspect

    from medicaldetectiontoolkit_tpu import models as model_registry
    from medicaldetectiontoolkit_tpu.models import build_model

    monkeypatch.setenv("MDT_MODEL", "retina_net")
    exp_path = str(tmp_path / "exp")

    saved_registry = dict(model_registry._REGISTRY)
    saved_backbone = sys.modules.get("medicaldetectiontoolkit_tpu.models.backbone")
    try:
        cf = utils.prep_exp("experiments/toy_exp", exp_path, use_stored_settings=False, is_training=True)
        assert os.path.isfile(os.path.join(exp_path, "model.py"))
        assert os.path.isfile(os.path.join(exp_path, "backbone.py"))
        assert not hasattr(cf, "model_source_path")  # fresh-settings training runs installed code

        # mutate the snapshot so we can prove it wins at test time
        with open(os.path.join(exp_path, "model.py"), "a") as f:
            f.write("\nSNAPSHOT_MARKER = 'frozen'\n")

        cf_test = utils.prep_exp("experiments/toy_exp", exp_path, use_stored_settings=True, is_training=False)
        assert cf_test.model_source_path == os.path.join(exp_path, "model.py")
        net = build_model(cf_test, _Log())
        mod = sys.modules[type(net).__module__]
        assert getattr(mod, "SNAPSHOT_MARKER", None) == "frozen"
        assert os.path.samefile(inspect.getfile(type(net)), os.path.join(exp_path, "model.py"))
    finally:
        model_registry._REGISTRY.clear()
        model_registry._REGISTRY.update(saved_registry)
        if saved_backbone is not None:
            sys.modules["medicaldetectiontoolkit_tpu.models.backbone"] = saved_backbone


def test_get_logger_per_dir_isolation(tmp_path):
    """Two exp dirs get independent loggers (concurrent folds don't
    cross-write); re-init for the same dir swaps handlers idempotently."""
    from medicaldetectiontoolkit_tpu.utils.exp_utils import get_logger

    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    l1 = get_logger(str(d1))
    l2 = get_logger(str(d2))
    assert l1 is not l2
    l1.info("alpha")
    l2.info("beta")
    assert "alpha" in (d1 / "exec.log").read_text()
    assert "beta" not in (d1 / "exec.log").read_text()
    assert "beta" in (d2 / "exec.log").read_text()
    # re-init same dir: no duplicate handlers
    l1b = get_logger(str(d1))
    assert l1b is l1 and len(l1.handlers) == 2


def test_maybe_initialize_distributed_requires_full_env(monkeypatch):
    from medicaldetectiontoolkit_tpu.parallel import maybe_initialize_distributed

    for var in ("MDT_DIST_COORD", "MDT_DIST_NPROCS", "MDT_DIST_RANK"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False
    monkeypatch.setenv("MDT_DIST_COORD", "127.0.0.1:1")  # partial env: still off
    assert maybe_initialize_distributed() is False


def test_save_checkpoint_atomic(tmp_path):
    """params.pkl appears only complete — no .tmp residue left behind."""
    import numpy as np
    from medicaldetectiontoolkit_tpu.utils.exp_utils import (
        load_checkpoint_state, save_checkpoint,
    )

    path = tmp_path / "ckpt"
    save_checkpoint(str(path), {"params": {"w": np.ones(3)}, "epoch": 2})
    assert (path / "params.pkl").is_file()
    assert not (path / "params.pkl.tmp").exists()
    state = load_checkpoint_state(str(path))
    assert state["epoch"] == 2
