"""Driver-level end-to-end smoke on the toy experiment WITH validation.

The PET-CT e2e (tests/test_petct_pipeline.py) covers the no-validation
branch; this covers the reference's main path — train epochs + a
val_sampling validation loop (pipelined one-deep like training) + model
selection + test-mode ensembling. Reference flow: /root/reference/exec.py
train() (epoch loop, val modes) and test().

Kept CPU-cheap via the MDT_TOY_* shrink knobs (tiny dataset, 96x96 patch
crops out of the fixed 320x320 toy images, --dev schedule).
"""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_toys(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("toys"))
    from experiments.toy_exp.generate_toys import generate_experiment

    generate_experiment(root, "donuts_shape", n_train_images=24, n_test_images=4, mode="donuts_shape")
    return root


@pytest.mark.slow
def test_toy_train_val_test_end_to_end(tiny_toys, tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        MDT_MODEL="retina_net",
        MDT_TOY_ROOT=tiny_toys,
        MDT_TOY_NTRAINVAL="24",
        MDT_TOY_PATCH="96,96",
        MDT_TOY_VAL_MODE="val_sampling",
        MDT_TOY_MAXTEST="2",
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
    exp_dir = os.path.join(str(tmp_path), "exp")
    res = subprocess.run(
        [sys.executable, "exec.py", "--mode", "train_test",
         "--exp_source", "experiments/toy_exp",
         "--exp_dir", exp_dir, "--folds", "0", "--dev"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1500,
    )
    assert res.returncode == 0, (res.stdout + res.stderr)[-5000:]
    fold_dir = os.path.join(exp_dir, "fold_0")
    # validation ran and ranked the epoch
    ranking = np.load(os.path.join(fold_dir, "epoch_ranking.npy"))
    assert list(ranking) == [1]
    # test-mode ensembling produced raw predictions + aggregated results
    raw = [f for f in os.listdir(fold_dir) if f.startswith("raw_pred_boxes")]
    assert raw, os.listdir(fold_dir)
    assert os.path.isfile(os.path.join(exp_dir, "results.txt"))
