"""Experiment bootstrap, logging, checkpointing, model selection, monitoring.

Rebuild of the reference's ``utils/exp_utils.py``:
  * ``prep_exp`` — experiment dir creation + config/model snapshotting so an
    exp dir is self-contained and cloud jobs survive source changes (:50-117);
  * ``get_logger`` — file + ANSI-colored console logging (:31-46, 281-346);
  * ``ModelSelector`` — top-k epoch checkpoints ranked by the mean of
    ``cf.model_selection_criteria`` val metrics, ``epoch_ranking.npy`` for
    inference-time temporal ensembling, plus an always-rewritten
    ``last_checkpoint`` with optimizer state for resume (:135-204);
  * ``prepare_monitoring`` / ``create_csv_output`` (:208-277).

Checkpoints store JAX pytrees (params, opt_state, epoch, metrics) as pickles
of NumPy leaves — directly mappable onto the reference's params.pth +
monitor_metrics.pickle layout.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import pickle
import shutil
import sys

import numpy as np
import pandas as pd


class ColorHandler(logging.StreamHandler):
    """Console handler coloring records by severity (ANSI, TTY-only).

    Parity with the reference's colored console logging
    (``utils/exp_utils.py:281-346``): debug green, info plain,
    warning/error red. Non-TTY streams get plain text.
    """

    _LEVEL_CODES = {logging.DEBUG: 32, logging.WARNING: 31, logging.ERROR: 31, logging.CRITICAL: 31}

    def emit(self, record):
        try:
            msg = self.format(record)
            code = self._LEVEL_CODES.get(record.levelno)
            if code is not None and getattr(self.stream, "isatty", lambda: False)():
                msg = f"\x1b[{code}m{msg}\x1b[0m"
            self.stream.write(msg + self.terminator)
            self.flush()
        except Exception:
            self.handleError(record)


def get_logger(exp_dir):
    # one logger PER exp/fold dir (not a process-global name): concurrent
    # folds in one process each keep their own file handler instead of
    # cross-writing through swapped handlers
    tag = os.path.abspath(exp_dir).replace(".", "_")  # dots would imply logger hierarchy
    logger = logging.getLogger(f"medicaldetectiontoolkit_tpu.{tag}")
    logger.setLevel(logging.DEBUG)
    for hdlr in list(logger.handlers):  # idempotent re-init for the same dir
        hdlr.close()
        logger.removeHandler(hdlr)
    log_file = os.path.join(exp_dir, "exec.log")
    logger.addHandler(logging.FileHandler(log_file))
    console = ColorHandler(sys.stdout)
    console.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(console)
    logger.propagate = False
    print(f"Logging to {log_file}")
    return logger


def import_module(name, path):
    """Import a module by file path (configs / data_loader plugin mechanism)."""
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _snapshot(src, dst):
    if os.path.isfile(src):
        shutil.copy(src, dst)


def model_source_file(model_name):
    """models/ file defining a given model (retina_unet lives in retina_net.py)."""
    return {"retina_unet": "retina_net.py"}.get(model_name, f"{model_name}.py")


def prep_exp(dataset_path, exp_path, server_env=False, use_stored_settings=True, is_training=True):
    """Create/enter an experiment dir; snapshot configs + model sources.

    The exp dir carries everything needed to re-run the experiment:
    configs.py (experiment), default_configs.py (base config module), and the
    selected model + backbone sources. Under ``use_stored_settings`` (and
    always at test time) the SNAPSHOTTED model/backbone are what actually
    runs — ``build_model`` imports them via ``cf.model_source_path`` /
    ``cf.backbone_source_path`` — so an exp dir reproduces its own run even
    after the installed sources change (reference ``exp_utils.py:85-131``).
    """
    package_dir = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    default_cfg_src = os.path.join(package_dir, "config.py")

    def snapshot_model_sources(cf):
        _snapshot(os.path.join(package_dir, "models", model_source_file(cf.model)), os.path.join(exp_path, "model.py"))
        _snapshot(os.path.join(package_dir, "models", "backbone.py"), os.path.join(exp_path, "backbone.py"))

    use_snapshot_sources = False
    if is_training:
        if not os.path.exists(exp_path):
            os.makedirs(os.path.join(exp_path, "plots"))
            _snapshot(os.path.join(dataset_path, "configs.py"), os.path.join(exp_path, "configs.py"))
            _snapshot(default_cfg_src, os.path.join(exp_path, "default_configs.py"))
        os.makedirs(os.path.join(exp_path, "plots"), exist_ok=True)

        if use_stored_settings:
            _snapshot(default_cfg_src, os.path.join(exp_path, "default_configs.py"))
            cf_file = import_module("cf", os.path.join(exp_path, "configs.py"))
            cf = cf_file.configs(server_env)
            if not os.path.isfile(os.path.join(exp_path, "model.py")):
                snapshot_model_sources(cf)
            use_snapshot_sources = True
        else:
            cf_file = import_module("cf", os.path.join(dataset_path, "configs.py"))
            cf = cf_file.configs(server_env)
            snapshot_model_sources(cf)
            _snapshot(default_cfg_src, os.path.join(exp_path, "default_configs.py"))
            _snapshot(os.path.join(dataset_path, "configs.py"), os.path.join(exp_path, "configs.py"))
    else:
        cf_file = import_module("cf", os.path.join(exp_path, "configs.py"))
        cf = cf_file.configs(server_env)
        use_snapshot_sources = True

    if use_snapshot_sources and os.path.isfile(os.path.join(exp_path, "model.py")):
        cf.model_source_path = os.path.join(exp_path, "model.py")
        cf.backbone_source_path = os.path.join(exp_path, "backbone.py")

    cf.exp_dir = exp_path
    cf.test_dir = os.path.join(cf.exp_dir, "test")
    cf.plot_dir = os.path.join(cf.exp_dir, "plots")
    cf.experiment_name = os.path.basename(exp_path.rstrip("/"))
    cf.server_env = server_env
    cf.created_fold_id_pickle = False
    os.makedirs(cf.plot_dir, exist_ok=True)
    return cf


#############################
#  checkpointing / ranking  #
#############################


def save_checkpoint(path, state):
    """Pickle a pytree state dict ({'params', 'opt_state', 'epoch', ...}).

    Write-then-rename: a crash mid-write (preemption is routine on TPU
    fleets) leaves the previous checkpoint intact instead of a truncated
    pickle that poisons --resume_to_checkpoint.
    """
    import jax

    os.makedirs(path, exist_ok=True)
    host_state = jax.device_get(state)
    final = os.path.join(path, "params.pkl")
    tmp = final + ".tmp"
    with open(tmp, "wb") as handle:
        pickle.dump(host_state, handle, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, final)


def _atomic_pickle(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "wb") as handle:
        pickle.dump(obj, handle)
    os.replace(tmp, path)


def _atomic_np_save(path, arr):
    # same write-then-rename treatment as the pickles: epoch_ranking is what
    # a preempted job's test-time ensembling reads, so it must never be
    # observable half-written
    if not path.endswith(".npy"):
        path += ".npy"
    tmp = path + ".tmp.npy"
    with open(tmp, "wb") as handle:
        np.save(handle, arr)
    os.replace(tmp, path)


def load_checkpoint_state(path):
    with open(os.path.join(path, "params.pkl"), "rb") as handle:
        return pickle.load(handle)


def load_checkpoint(checkpoint_path, net):
    """Resume: restore net params + optimizer state; return (epoch+1, metrics)."""
    state = load_checkpoint_state(checkpoint_path)
    net.load_state_dict(state)
    with open(os.path.join(checkpoint_path, "monitor_metrics.pickle"), "rb") as handle:
        monitor_metrics = pickle.load(handle)
    return state["epoch"] + 1, monitor_metrics


class ModelSelector:
    """Top-k epoch checkpointing by mean val selection criteria + resume ckpt.

    With ``cf.do_validation = False`` (the reference's PET-CT setting) the
    criteria are read from the TRAIN metrics instead — the reference writes
    no ranking at all in that mode, which leaves ``--mode test`` with
    nothing to ensemble (``/root/reference/exec.py:86-100`` never calls
    selection; ``predictor.py:71-74`` then raises). Selecting on train
    scores keeps that pipeline usable without changing validated behavior.
    """

    def __init__(self, cf, logger):
        self.cf = cf
        self.logger = logger
        self.saved_epochs = [-1] * cf.save_n_models

    def run_model_selection(self, net, monitor_metrics, epoch):
        source = "val" if getattr(self.cf, "do_validation", True) else "train"
        non_nan_scores = np.mean(
            np.array(
                [[0 if ii is None else ii for ii in monitor_metrics[source][sc]] for sc in self.cf.model_selection_criteria]
            ),
            0,
        )
        epochs_scores = [ii for ii in non_nan_scores[1:]]
        epoch_ranking = np.argsort(epochs_scores)[::-1] + 1  # epochs start at 1
        epoch_ranking = epoch_ranking[epoch_ranking >= self.cf.min_save_thresh]

        if epoch in epoch_ranking[: self.cf.save_n_models]:
            save_dir = os.path.join(self.cf.fold_dir, f"{epoch}_best_checkpoint")
            save_checkpoint(save_dir, {"params": net.params, "epoch": epoch})
            _atomic_pickle(os.path.join(save_dir, "monitor_metrics.pickle"), monitor_metrics)
            _atomic_np_save(os.path.join(self.cf.fold_dir, "epoch_ranking"), epoch_ranking[: self.cf.save_n_models])
            _atomic_np_save(os.path.join(save_dir, "epoch_ranking"), epoch_ranking[: self.cf.save_n_models])
            self.logger.info(f"saving current epoch {epoch} at rank {np.argwhere(epoch_ranking == epoch)}")
            # delete checkpoints that fell out of the top-k
            for se in [int(ii.split("_")[0]) for ii in os.listdir(self.cf.fold_dir) if "best_checkpoint" in ii]:
                if se in epoch_ranking[self.cf.save_n_models :]:
                    shutil.rmtree(os.path.join(self.cf.fold_dir, f"{se}_best_checkpoint"), ignore_errors=True)
                    self.logger.info(f"deleting epoch {se} at rank {np.argwhere(epoch_ranking == se)}")

        # always (re)write the resume checkpoint with optimizer state
        save_dir = os.path.join(self.cf.fold_dir, "last_checkpoint")
        state = dict(net.state_dict())
        state["epoch"] = epoch
        save_checkpoint(save_dir, state)
        _atomic_np_save(os.path.join(save_dir, "epoch_ranking"), epoch_ranking[: self.cf.save_n_models])
        _atomic_pickle(os.path.join(save_dir, "monitor_metrics.pickle"), monitor_metrics)


def prepare_monitoring(cf):
    """Monitor-metrics dicts (train/val per-class AP, patient AUC, raw values)."""
    from collections import OrderedDict

    from medicaldetectiontoolkit_tpu import plotting

    metrics = {"train": OrderedDict(), "val": OrderedDict()}
    metric_classes = []
    if "rois" in cf.report_score_level:
        metric_classes.extend([v for k, v in cf.class_dict.items()])
    if "patient" in cf.report_score_level:
        metric_classes.extend(["patient"])
    for cl in metric_classes:
        metrics["train"][cl + "_ap"] = [None]
        metrics["val"][cl + "_ap"] = [None]
        if cl == "patient":
            metrics["train"][cl + "_auc"] = [None]
            metrics["val"][cl + "_auc"] = [None]
    metrics["train"]["monitor_values"] = [[] for _ in range(cf.num_epochs + 1)]
    metrics["val"]["monitor_values"] = [[] for _ in range(cf.num_epochs + 1)]

    training_plot = plotting.TrainingPlot2Panel(cf)
    return metrics, training_plot


def create_csv_output(results_list, cf, logger):
    """results_{fold}.csv: patientID | predictionID | coords | score | class."""
    logger.info(f"creating csv output file at {os.path.join(cf.exp_dir, 'results.csv')}")
    rows = []
    for r in results_list:
        pid = r[1]
        for bix, box in enumerate(r[0][0]):
            assert box["box_type"] == "det", box["box_type"]
            if box["box_score"] >= cf.min_det_thresh:
                rows.append([pid, bix, list(np.asarray(box["box_coords"]).tolist()), box["box_score"], box["box_pred_class_id"]])
    predictions_df = pd.DataFrame(rows, columns=["patientID", "predictionID", "coords", "score", "pred_classID"])
    fold = getattr(cf, "fold", "hold_out")
    predictions_df.to_csv(os.path.join(cf.exp_dir, f"results_{fold}.csv"), index=False)
    return predictions_df
