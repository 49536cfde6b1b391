"""Multi-chip sharding tests: run the data-parallel dry run in a CPU
subprocess with 8 virtual devices (the JAX platform can't be switched
in-process once initialized)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cpu_subprocess(code, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon plugin's forced platform
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    res = run_cpu_subprocess("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK: 8 devices" in res.stdout


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """One DP step over 4 devices must produce the same loss as 1 device."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh, make_data_parallel_step, shard_batch
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='retina_net', dim=2, batch_size=4, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch['data'])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(batch['bb_target'], batch['roi_labels'], 4, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch['seg'])
rng = jax.random.PRNGKey(7)
lr = jnp.float32(1e-4)

import copy
params0 = jax.tree_util.tree_map(lambda x: x.copy(), net.params)
opt0 = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy') else x, net.opt_state)

# single device
out1 = net._train_step_fn(net.params, net.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, seg)
loss1 = float(out1[2]['loss'])

# 4-device mesh
mesh = get_mesh(4)
step = make_data_parallel_step(net, mesh)
simg, sb, si, sv, ss = shard_batch(mesh, img, gt_boxes, gt_ids, gt_valid, seg)
out4 = step(params0, opt0, rng, lr, simg, sb, si, sv, ss)
loss4 = float(out4[2]['loss'])
print('LOSSES', loss1, loss4)
assert abs(loss1 - loss4) < 1e-3, (loss1, loss4)
print('DP-MATCH-OK')
"""
    res = run_cpu_subprocess(code)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "DP-MATCH-OK" in res.stdout
