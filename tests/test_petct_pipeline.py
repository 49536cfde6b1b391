"""PET/CT experiment pipeline test on synthetic dual-modality data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


class _Log:
    def info(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def synth_petct(tmp_path_factory):
    from experiments.pet_ct_tnm_classification.preprocessing import generate_synthetic_petct

    out = str(tmp_path_factory.mktemp("synth_petct"))
    generate_synthetic_petct(out, n_patients=4, shape=(12, 48, 48))
    return out


def test_petct_batch_contract(synth_petct, tmp_path):
    os.environ["MDT_PETCT_PP"] = synth_petct
    os.environ["MDT_MODEL"] = "retina_net"
    import importlib

    import experiments.pet_ct_tnm_classification.configs as cfg_mod
    import experiments.pet_ct_tnm_classification.data_loader as dl

    importlib.reload(cfg_mod)
    cf = cfg_mod.configs()
    cf.exp_dir = str(tmp_path)
    cf.batch_size = 2
    cf.n_workers = 2
    cf.pre_crop_size = [40, 40, 10]
    cf.patch_size = [32, 32, 8]
    cf.da_kwargs["do_rotation"] = False
    cf.da_kwargs["do_scale"] = False
    cf.select_prototype_subset = None
    cf.created_fold_id_pickle = False
    cf.server_env = False
    cf.n_cv_splits = 4
    cf.fold = 0

    gens = dl.get_train_generators(cf, _Log())
    batch = next(gens["train"])
    gens["train"].shutdown()
    gens["val_sampling"].shutdown()
    assert batch["data"].shape == (2, 2, 32, 32, 8)  # dual modality channels
    assert batch["seg"].shape == (2, 1, 32, 32, 8)
    assert len(batch["bb_target"]) == 2

    test_gen = dl.get_test_generator(cf, _Log())
    patient = next(test_gen["test"])
    assert patient["data"].shape[1] == 2  # channels preserved
    assert "patient_bb_target" in patient
    if "patch_crop_coords" in patient:
        assert patient["data"].shape[2:] == (32, 32, 8)


@pytest.mark.slow
def test_petct_train_test_end_to_end(synth_petct, tmp_path):
    """Full driver path on synthetic PET/CT: train (do_validation=False ->
    model selection on TRAIN metrics) then test-mode ensembling. Pins the
    no-validation pipeline the reference leaves broken (its exec.py never
    ranks checkpoints without a val loop, so --mode test has nothing to
    ensemble; see ModelSelector docstring)."""
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        MDT_PETCT_PP=synth_petct,
        MDT_PETCT_PATCH="32,32,8",
        MDT_MODEL="retina_net",
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
    exp_dir = os.path.join(str(tmp_path), "exp")
    res = subprocess.run(
        [_sys.executable, "exec.py", "--mode", "train_test",
         "--exp_source", "experiments/pet_ct_tnm_classification",
         "--exp_dir", exp_dir, "--folds", "0", "--dev"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-4000:]
    fold_dir = os.path.join(exp_dir, "fold_0")
    ranking = np.load(os.path.join(fold_dir, "epoch_ranking.npy"))
    assert list(ranking) == [1]  # selected on train metrics despite no val
    assert os.path.isfile(os.path.join(exp_dir, "results.txt"))
    raw = [f for f in os.listdir(fold_dir) if f.startswith("raw_pred_boxes")]
    assert raw, os.listdir(fold_dir)


def test_get_z_crops_synthetic():
    from experiments.pet_ct_tnm_classification.preprocessing import get_z_crops

    # CT with two 'lungs' (air blobs) on slices 10..30
    x = np.zeros((40, 128, 128), np.float32)
    x[10:30, 40:80, 30:55] = -1000
    x[10:30, 40:80, 75:100] = -1000
    zmin, zmax = get_z_crops(x, 0, min_pix=200, rad_crit=20000)
    assert zmin <= 10 and zmax >= 29
