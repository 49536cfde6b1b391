#!/usr/bin/env python
"""Execution script: train / test / train_test / analysis / create_exp.

Same CLI surface as the reference's ``exec.py`` (--mode, --folds, --exp_dir,
--exp_source, --server_env, --data_dest, --use_stored_settings,
--resume_to_checkpoint, --dev). The train loop keeps the reference's epoch
structure (per-epoch lr list, train batches -> train eval -> validation ->
model selection -> plots), but each train step is a single jitted device
program (forward + loss + grads + update) instead of forward / backward /
step host round-trips.
"""

import argparse
import os
import time

# persistent XLA compile cache: 3D LIDC programs take 10-20 min through the
# remote TPU compile service cold; cached reruns are instant. Must be set
# before any backend init.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")

from medicaldetectiontoolkit_tpu.parallel import maybe_initialize_distributed

# multi-host bring-up must precede any backend use (it rewrites the global
# device list); no-op unless the MDT_DIST_* env triple is set.
maybe_initialize_distributed()

import medicaldetectiontoolkit_tpu.utils.exp_utils as utils
from medicaldetectiontoolkit_tpu.evaluator import Evaluator
from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.plotting import plot_batch_prediction
from medicaldetectiontoolkit_tpu.predictor import Predictor


def train(cf, data_loader, logger):
    """Training routine for one fold; writes plots + checkpoints to exp dir."""
    logger.info(
        "performing training in {}D over fold {} on experiment {} with model {}".format(
            cf.dim, cf.fold, cf.exp_dir, cf.model
        )
    )

    net = build_model(cf, logger)
    net.initialize()
    if getattr(cf, "n_space_parallel", None) and cf.n_space_parallel > 1:
        # 2D (data x space) mesh: for patches too large for one chip's HBM
        net.enable_spatial_parallel()
    elif getattr(cf, "n_data_parallel", None) and cf.n_data_parallel > 1:
        net.enable_data_parallel()
    model_selector = utils.ModelSelector(cf, logger)
    train_evaluator = Evaluator(cf, logger, mode="train")
    val_evaluator = Evaluator(cf, logger, mode=cf.val_mode)

    starting_epoch = 1
    monitor_metrics, training_plot = utils.prepare_monitoring(cf)

    if cf.resume_to_checkpoint:
        starting_epoch, monitor_metrics = utils.load_checkpoint(cf.resume_to_checkpoint, net)
        logger.info(f"resumed to checkpoint {cf.resume_to_checkpoint} at epoch {starting_epoch}")

    logger.info("loading dataset and initializing batch generators...")
    batch_gen = data_loader.get_train_generators(cf, logger)

    for epoch in range(starting_epoch, cf.num_epochs + 1):
        logger.info(f"starting training epoch {epoch}")
        net.current_lr = cf.learning_rate[epoch - 1]

        start_time = time.time()
        train_results_list = []

        profiling = getattr(cf, "profile", False) and epoch == starting_epoch
        # one-step-deep software pipeline: dispatch step i+1 to the device
        # BEFORE converting step i's results on the host (box building,
        # logging, metric floats all force device->host syncs) — the device
        # never idles on host monitoring. MDT_TRAIN_PIPELINE=0 restores the
        # strictly-serial loop (identical results, order preserved).
        pipelined = os.environ.get("MDT_TRAIN_PIPELINE", "1") != "0" and hasattr(
            net, "train_forward_dispatch"
        )
        pending = None

        def _finish(handles, fbatch, fbix, tic, foreign=0.0):
            # monitoring consumes boxes + floats only; skip the full-volume
            # seg_preds device->host pull (the slow direction of the link)
            results_dict = net.train_forward_convert(handles, fbatch, need_seg_preds=False)
            # 'foreign' is host time spent on the NEXT batch (loading +
            # dispatch) between this batch's tic and now — subtract it so the
            # pipelined log reports this step's own device+convert time, not
            # step+data time (which would read as a device regression vs the
            # serial loop / bench.py)
            train_time_step = time.time() - tic - foreign
            logger.info(
                "tr. batch {0}/{1} (ep. {2}) step {3:.3f}s || ".format(
                    fbix + 1, cf.num_train_batches, epoch, train_time_step
                )
                + results_dict["logger_string"]
            )
            train_results_list.append([results_dict["boxes"], fbatch["pid"]])
            monitor_metrics["train"]["monitor_values"][epoch].append(results_dict["monitor_values"])

        for bix in range(cf.num_train_batches):
            if profiling and bix == 2:  # skip compile steps, trace steady state
                import jax

                jax.profiler.start_trace(os.path.join(cf.exp_dir, "profile"))
            t_load0 = time.time()
            batch = next(batch_gen["train"])
            tic_fw = time.time()
            if pipelined:
                handles = net.train_forward_dispatch(batch)
                if pending is not None:
                    _finish(*pending, foreign=time.time() - t_load0)
                pending = (handles, batch, bix, tic_fw)
            else:
                _finish(net.train_forward_dispatch(batch), batch, bix, tic_fw)
            if profiling and bix == 6:
                import jax

                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {os.path.join(cf.exp_dir, 'profile')}")
                profiling = False
        if pending is not None:
            _finish(*pending)

        _, monitor_metrics["train"] = train_evaluator.evaluate_predictions(
            train_results_list, monitor_metrics["train"]
        )
        train_time = time.time() - start_time

        logger.info(f"starting validation in mode {cf.val_mode}.")
        if cf.do_validation:
            val_results_list = []
            val_predictor = Predictor(cf, net, logger, mode="val")
            pending_val = None  # val_sampling pipelines one-deep like training

            def _record_val(results_dict, fbatch):
                val_results_list.append([results_dict["boxes"], fbatch["pid"]])
                monitor_metrics["val"]["monitor_values"][epoch].append(results_dict["monitor_values"])

            for _ in range(batch_gen["n_val"]):
                batch = next(batch_gen[cf.val_mode])
                if cf.val_mode == "val_patient":
                    _record_val(val_predictor.predict_patient(batch), batch)
                elif pipelined:
                    handles = net.train_forward_dispatch(batch, is_validation=True)
                    if pending_val is not None:
                        _record_val(
                            net.train_forward_convert(*pending_val, need_seg_preds=False),
                            pending_val[1],
                        )
                    pending_val = (handles, batch)
                else:
                    _record_val(
                        net.train_forward(batch, is_validation=True, need_seg_preds=False), batch
                    )
            if pending_val is not None:
                _record_val(
                    net.train_forward_convert(*pending_val, need_seg_preds=False), pending_val[1]
                )

            _, monitor_metrics["val"] = val_evaluator.evaluate_predictions(val_results_list, monitor_metrics["val"])
            model_selector.run_model_selection(net, monitor_metrics, epoch)
        else:
            # no validation configured (e.g. PET-CT): select on train metrics
            # so --mode test still has ranked checkpoints to ensemble
            model_selector.run_model_selection(net, monitor_metrics, epoch)

        training_plot.update_and_save(monitor_metrics, epoch)
        epoch_time = time.time() - start_time
        logger.info(
            f"trained epoch {epoch}: took {epoch_time:.1f} sec. ({train_time:.1f} train / {epoch_time - train_time:.1f} val)"
        )
        batch = next(batch_gen["val_sampling"])
        results_dict = net.train_forward(batch, is_validation=True)
        logger.info("plotting predictions from validation sampling.")
        plot_batch_prediction(batch, results_dict, cf)

    for key in ("train", "val_sampling"):
        if key in batch_gen and hasattr(batch_gen[key], "shutdown"):
            batch_gen[key].shutdown()


def test(cf, data_loader, logger):
    """Testing for one fold (or the hold-out set); stats land in evaluator."""
    logger.info(f"starting testing model of fold {cf.fold} in exp {cf.exp_dir}")
    net = build_model(cf, logger)
    net.initialize()
    test_predictor = Predictor(cf, net, logger, mode="test")
    test_evaluator = Evaluator(cf, logger, mode="test")
    batch_gen = data_loader.get_test_generator(cf, logger)
    test_results_list = test_predictor.predict_test_set(batch_gen, return_results=True)
    test_evaluator.evaluate_predictions(test_results_list)
    test_evaluator.score_test_df()


def apply_dev_shrinkage(cf, args, folds):
    if args.dev:
        if folds is None:
            folds = [0, 1]
        cf.batch_size = 3 if cf.dim == 2 else 1
        cf.num_epochs, cf.min_save_thresh, cf.save_n_models = 1, 0, 1
        cf.num_train_batches, cf.num_val_batches, cf.max_val_patients = 5, 1, 1
        cf.test_n_epochs = cf.save_n_models
        cf.max_test_patients = 1
    return folds


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--mode", type=str, default="train_test",
                        help="pipeline stage to run: train | test | train_test | analysis | create_exp")
    parser.add_argument("-f", "--folds", nargs="+", type=int, default=None,
                        help="cross-validation folds to process (default: every fold)")
    parser.add_argument("--exp_dir", type=str, default="/tmp/mdt_tpu_exp",
                        help="experiment output directory (created on demand)")
    parser.add_argument("--server_env", default=False, action="store_true",
                        help="switch IO paths to the cluster layout from the experiment config")
    parser.add_argument("--data_dest", type=str, default=None,
                        help="override the config's preprocessed-data location")
    parser.add_argument("--use_stored_settings", default=False, action="store_true",
                        help="run with the config snapshot already in exp_dir rather than the source tree")
    parser.add_argument("--resume_to_checkpoint", type=str, default=None,
                        help="checkpoint directory to continue training from (pick the fold via --folds)")
    parser.add_argument("--exp_source", type=str, default="experiments/toy_exp",
                        help="experiment package providing configs.py and data_loader.py")
    parser.add_argument("-d", "--dev", default=False, action="store_true",
                        help="tiny-scale smoke mode: few batches, few epochs, one patient")
    args = parser.parse_args()
    folds = args.folds
    resume_to_checkpoint = args.resume_to_checkpoint

    if args.mode in ("train", "train_test"):
        cf = utils.prep_exp(args.exp_source, args.exp_dir, args.server_env, args.use_stored_settings)
        folds = apply_dev_shrinkage(cf, args, folds)
        cf.data_dest = args.data_dest
        data_loader = utils.import_module("dl", os.path.join(args.exp_source, "data_loader.py"))
        if folds is None:
            folds = range(cf.n_cv_splits)

        for fold in folds:
            cf.fold_dir = os.path.join(cf.exp_dir, f"fold_{fold}")
            cf.fold = fold
            cf.resume_to_checkpoint = resume_to_checkpoint
            os.makedirs(cf.fold_dir, exist_ok=True)
            logger = utils.get_logger(cf.fold_dir)
            train(cf, data_loader, logger)
            cf.resume_to_checkpoint = None
            if args.mode == "train_test":
                test(cf, data_loader, logger)
            for hdlr in logger.handlers:
                hdlr.close()
            logger.handlers = []

    elif args.mode == "test":
        cf = utils.prep_exp(args.exp_source, args.exp_dir, args.server_env, is_training=False, use_stored_settings=True)
        if args.dev:
            folds = [0, 1]
            cf.test_n_epochs = 1
            cf.max_test_patients = 1
        cf.data_dest = args.data_dest
        data_loader = utils.import_module("dl", os.path.join(args.exp_source, "data_loader.py"))
        if folds is None:
            folds = range(cf.n_cv_splits)
        for fold in folds:
            cf.fold_dir = os.path.join(cf.exp_dir, f"fold_{fold}")
            cf.fold = fold
            logger = utils.get_logger(cf.fold_dir)
            test(cf, data_loader, logger)
            for hdlr in logger.handlers:
                hdlr.close()
            logger.handlers = []

    elif args.mode == "analysis":
        cf = utils.prep_exp(args.exp_source, args.exp_dir, args.server_env, is_training=False, use_stored_settings=True)
        logger = utils.get_logger(cf.exp_dir)
        if cf.hold_out_test_set:
            cf.folds = args.folds
            predictor = Predictor(cf, net=None, logger=logger, mode="analysis")
            results_list = predictor.load_saved_predictions(apply_wbc=True)
            utils.create_csv_output(results_list, cf, logger)
        else:
            if folds is None:
                folds = range(cf.n_cv_splits)
            for fold in folds:
                cf.fold_dir = os.path.join(cf.exp_dir, f"fold_{fold}")
                cf.fold = fold
                predictor = Predictor(cf, net=None, logger=logger, mode="analysis")
                results_list = predictor.load_saved_predictions(apply_wbc=True)
                logger.info("starting evaluation...")
                evaluator = Evaluator(cf, logger, mode="test")
                evaluator.evaluate_predictions(results_list)
                evaluator.score_test_df()

    elif args.mode == "create_exp":
        cf = utils.prep_exp(args.exp_source, args.exp_dir, args.server_env, use_stored_settings=True)
        logger = utils.get_logger(cf.exp_dir)
        logger.info(f"created experiment directory at {args.exp_dir}")

    else:
        raise RuntimeError(f"unknown --mode {args.mode!r}; see --help for the supported stages")
