"""Data-parallel training for the two-stage detector (CPU subprocess mesh)."""

import pytest

from tests.test_parallel import run_cpu_subprocess


@pytest.mark.slow
def test_mrcnn_data_parallel_step_matches_single_device():
    code = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='mrcnn', dim=2, batch_size=4, patch_size=[64, 64], retina_scales=False)
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)

params0 = jax.device_get(net.params)
opt0 = jax.device_get(net.opt_state)

net._rng = jax.random.PRNGKey(99)
res1 = net.train_forward(batch, is_validation=True)
loss1 = res1['loss']

mesh = net.enable_data_parallel(4)
net.load_state_dict({'params': params0, 'opt_state': opt0})
net._rng = jax.random.PRNGKey(99)  # same per-step rng as the reference call
res4 = net.train_forward(batch)   # goes through the sharded step
loss4 = res4['loss']
print('LOSSES', loss1, loss4)
assert abs(loss1 - loss4) < 1e-3, (loss1, loss4)
print('MRCNN-DP-OK')
"""
    res = run_cpu_subprocess(code, timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "MRCNN-DP-OK" in res.stdout
