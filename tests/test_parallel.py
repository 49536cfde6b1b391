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
# fp32 CPU, fixed seed: only psum reduction order differs -> 1e-5 catches
# real divergence (was 1e-3, which only caught catastrophic breakage)
assert abs(loss1 - loss4) < 1e-5, (loss1, loss4)
print('DP-MATCH-OK')

# enable_data_parallel wiring: train_forward (val path -> DP loss-eval) and
# test_forward (-> DP predict, static-flag binding) must match single-device
net1 = build_model(cf, L())
net1.initialize(seed=0)
net1.current_lr = 1e-4
rv1 = net1.train_forward(dict(batch), is_validation=True)
t1 = net1.test_forward({'data': batch['data']})

net4 = build_model(cf, L())
net4.initialize(seed=0)
net4.current_lr = 1e-4
net4.enable_data_parallel(4)
rv4 = net4.train_forward(dict(batch), is_validation=True)
t4 = net4.test_forward({'data': batch['data']})
assert abs(float(rv1['monitor_values']['loss']) - float(rv4['monitor_values']['loss'])) < 1e-5
np.testing.assert_allclose(t1['seg_preds'], t4['seg_preds'])
print('DP-WIRING-OK')
"""
    res = run_cpu_subprocess(code)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "DP-MATCH-OK" in res.stdout
    assert "DP-WIRING-OK" in res.stdout


@pytest.mark.slow
def test_spatial_partitioned_inference_matches_single_device():
    """2D (data x space) mesh: image Y sharded across devices, GSPMD halo
    exchanges in the convs — predictions must be bit-exact vs one device.
    Also pins the safety cap: space shards beyond the C5 Y-extent refuse."""
    code = """
import os
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh_2d, make_spatial_predict
from medicaldetectiontoolkit_tpu.parallel import mesh as pmesh
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

os.environ['MDT_SP_VERIFY'] = '1'  # exercise the one-time runtime self-check

class L:
    def info(self, *a, **k): pass

cf = make_config(model='retina_net', dim=2, batch_size=2, patch_size=[128, 128])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch['data'])
ref = jax.jit(net._predict)(net.params, img)

mesh = get_mesh_2d(2, 4)
pred = make_spatial_predict(net, mesh)
out = pred(net.params, img)
for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

# the GSPMD miscompilation pin: with the space_fence disabled at a measured
# known-bad geometry (patch 64, mesh (2,2) — head logits wrong by ~0.1),
# the MDT_SP_VERIFY runtime check must catch it; with the real fence the
# same geometry passes (covered by the Predictor-level spatial test)
pmesh._SAFE_SPACE_EXTENT = 0
cf64 = make_config(model='retina_net', dim=2, batch_size=4, patch_size=[64, 64])
net64 = build_model(cf64, L())
net64.initialize(seed=0)
img64 = model_base.image_to_device(make_batch(cf64)['data'])
pred64 = make_spatial_predict(net64, get_mesh_2d(2, 2))
try:
    pred64(net64.params, img64)
except AssertionError as e:
    assert 'verify failed' in str(e), str(e)[:500]
else:
    raise AssertionError('MDT_SP_VERIFY did not catch the known-bad geometry')
pmesh._SAFE_SPACE_EXTENT = 32

# fence ON at the same known-bad geometry, WARM order (single-device predict
# traced first): pins the jaxpr-cache regression — make_spatial_predict must
# not reuse the fence-less cached trace of the same bound method
# (tools/jaxpr_cache_repro.py)
ref64 = jax.jit(net64._predict)(net64.params, img64)
pred64_fenced = make_spatial_predict(net64, get_mesh_2d(2, 2))
out64 = pred64_fenced(net64.params, img64)
for a, b in zip(jax.tree_util.tree_leaves(ref64), jax.tree_util.tree_leaves(out64)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               err_msg='warm-order spatial predict diverged: stale fence-less jaxpr reused')

# cap: 4-way space > C5 Y-extent 2 (patch 64) must refuse
cf_small = make_config(model='retina_net', dim=2, batch_size=2, patch_size=[64, 64])
net_small = build_model(cf_small, L())
net_small.initialize(seed=0)
try:
    make_spatial_predict(net_small, get_mesh_2d(1, 4))
except ValueError as e:
    assert 'C5 Y-extent' in str(e)
else:
    raise AssertionError('cap did not trigger')

# runtime cap: a predict built under patch 128 must still refuse an ACTUAL
# image whose deepest-level Y shrinks under the shard count (jit would
# happily recompile for the smaller shape, re-exposing the GSPMD bug)
try:
    pred(net.params, img[:, :64])
except ValueError as e:
    assert 'Y-extent' in str(e)
else:
    raise AssertionError('runtime cap did not trigger')
print('SPATIAL-OK')
"""
    res = run_cpu_subprocess(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SPATIAL-OK" in res.stdout


@pytest.mark.slow
def test_spatial_train_step_matches_single_device():
    """One spatially-sharded train step (batch on 'data', image Y on 'space')
    must match the single-device step: same loss to reduction-order
    tolerance, same updated params."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh_2d, make_spatial_train_step
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='retina_net', dim=2, batch_size=4, patch_size=[128, 128])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch['data'])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(batch['bb_target'], batch['roi_labels'], 4, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch['seg'])
rng = jax.random.PRNGKey(3)
lr = jnp.float32(1e-4)

params0 = jax.tree_util.tree_map(lambda x: x.copy(), net.params)
opt0 = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy') else x, net.opt_state)

out1 = net._train_step_fn(net.params, net.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, seg)
loss1 = float(out1[2]['loss'])

step = make_spatial_train_step(net, get_mesh_2d(2, 4))
out2 = step(params0, opt0, rng, lr, np.asarray(img), np.asarray(gt_boxes),
            np.asarray(gt_ids), np.asarray(gt_valid), np.asarray(seg))
loss2 = float(out2[2]['loss'])
print('LOSSES', loss1, loss2)
assert abs(loss1 - loss2) < 1e-5, (loss1, loss2)
for a, b in zip(jax.tree_util.tree_leaves(out1[0]), jax.tree_util.tree_leaves(out2[0])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
print('SPATIAL-TRAIN-OK')

# same check at the measured GSPMD-miscompile geometry (patch 64, mesh
# (2,2)) — gradients flow through the same partitioned backbone, so the
# space_fence must hold for training too
cf = make_config(model='retina_net', dim=2, batch_size=4, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch['data'])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(batch['bb_target'], batch['roi_labels'], 4, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch['seg'])
params0 = jax.tree_util.tree_map(lambda x: x.copy(), net.params)
opt0 = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy') else x, net.opt_state)
out1 = net._train_step_fn(net.params, net.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, seg)
step = make_spatial_train_step(net, get_mesh_2d(2, 2))
out2 = step(params0, opt0, rng, lr, np.asarray(img), np.asarray(gt_boxes),
            np.asarray(gt_ids), np.asarray(gt_valid), np.asarray(seg))
assert abs(float(out1[2]['loss']) - float(out2[2]['loss'])) < 1e-5
for a, b in zip(jax.tree_util.tree_leaves(out1[0]), jax.tree_util.tree_leaves(out2[0])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)
print('SPATIAL-TRAIN-FENCE-OK')
"""
    res = run_cpu_subprocess(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SPATIAL-TRAIN-OK" in res.stdout
    assert "SPATIAL-TRAIN-FENCE-OK" in res.stdout


@pytest.mark.slow
def test_spatial_train_step_matches_single_device_3d():
    """3D geometry (the flagship LIDC shape class): one spatially-sharded
    train step over a (2 data x 2 space) mesh must match the single-device
    step. Warm order (single-device traced first) also pins the jaxpr-cache
    regression for the 3D program."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh_2d, make_spatial_train_step
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='retina_net', dim=3, batch_size=2, patch_size=[64, 64, 8])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch['data'])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(batch['bb_target'], batch['roi_labels'], 2, 3, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch['seg'])
rng = jax.random.PRNGKey(3)
lr = jnp.float32(1e-4)

params0 = jax.tree_util.tree_map(lambda x: x.copy(), net.params)
opt0 = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy') else x, net.opt_state)

out1 = net._train_step_fn(net.params, net.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, seg)
loss1 = float(out1[2]['loss'])

step = make_spatial_train_step(net, get_mesh_2d(2, 2))
out2 = step(params0, opt0, rng, lr, np.asarray(img), np.asarray(gt_boxes),
            np.asarray(gt_ids), np.asarray(gt_valid), np.asarray(seg))
loss2 = float(out2[2]['loss'])
assert abs(loss1 - loss2) < 1e-5, (loss1, loss2)
for a, b in zip(jax.tree_util.tree_leaves(out1[0]), jax.tree_util.tree_leaves(out2[0])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)
print('SPATIAL-TRAIN-3D-OK')
"""
    res = run_cpu_subprocess(code, timeout=1800)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SPATIAL-TRAIN-3D-OK" in res.stdout


@pytest.mark.slow
def test_spatial_predict_matches_single_device_mrcnn():
    """mrcnn spatial predict with the static with_masks flag: pjit rejects
    kwargs when in_shardings is set, so the wrapper must bind the full
    signature and pass flags positionally (regression for a crash) — and the
    sharded two-stage forward must match single-device."""
    code = """
import jax, numpy as np
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh_2d, make_spatial_predict
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='mrcnn', dim=2, batch_size=2, patch_size=[128, 128], retina_scales=False)
net = build_model(cf, L())
net.initialize(seed=0)
img = model_base.image_to_device(make_batch(cf)['data'])
ref = jax.jit(net._predict, static_argnums=(2,))(net.params, img, True)
pred = make_spatial_predict(net, get_mesh_2d(2, 4))
out = pred(net.params, img, with_masks=True)
for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
    np.testing.assert_allclose(np.asarray(a, np.float64), np.asarray(b, np.float64), atol=1e-5)
print('MRCNN-SPATIAL-PREDICT-OK')
"""
    res = run_cpu_subprocess(code, timeout=3000)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "MRCNN-SPATIAL-PREDICT-OK" in res.stdout


@pytest.mark.slow
def test_spatial_train_step_matches_single_device_mrcnn():
    """Two-stage model under the 2D (data x space) mesh: proposal NMS,
    pyramid RoIAlign and detection-target sampling must all partition
    correctly — one spatial mrcnn step must match the single-device step."""
    code = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.parallel import get_mesh_2d, make_spatial_train_step
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='mrcnn', dim=2, batch_size=2, patch_size=[128, 128], retina_scales=False)
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
rng = jax.random.PRNGKey(0)
lr = jnp.float32(1e-4)
img, gt_boxes, gt_ids, gt_valid, gt_masks, seg = net._prep(batch)
params0 = jax.tree_util.tree_map(lambda x: x.copy(), net.params)
opt0 = jax.tree_util.tree_map(lambda x: x.copy() if hasattr(x, 'copy') else x, net.opt_state)
out1 = net._train_step_fn(net.params, net.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg)
loss1 = float(out1[2]['loss'])
step = make_spatial_train_step(net, get_mesh_2d(2, 2))
out2 = step(params0, opt0, rng, lr, np.asarray(img), np.asarray(gt_boxes), np.asarray(gt_ids),
            np.asarray(gt_valid), np.asarray(gt_masks), np.asarray(seg))
loss2 = float(out2[2]['loss'])
assert abs(loss1 - loss2) < 1e-5, (loss1, loss2)
for a, b in zip(jax.tree_util.tree_leaves(out1[0]), jax.tree_util.tree_leaves(out2[0])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)
print('SPATIAL-TRAIN-MRCNN-OK')
"""
    res = run_cpu_subprocess(code, timeout=3000)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SPATIAL-TRAIN-MRCNN-OK" in res.stdout


@pytest.mark.slow
def test_enable_spatial_parallel_train_forward():
    """The trainer-facing wiring: enable_spatial_parallel swaps ALL THREE
    jitted fns (train step, loss eval, predict) for 2D-mesh ones — the
    per-epoch validation and plotting forwards run at the same
    full-resolution geometry as training, so leaving them single-device
    would OOM exactly when spatial training is needed. Pins host-level
    train_forward (update + validation paths) and test_forward equality
    vs the unsharded net at fixed rng."""
    code = """
import numpy as np
from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model='retina_net', dim=2, batch_size=4, patch_size=[128, 128])
net = build_model(cf, L())
net.initialize(seed=0)
net.current_lr = 1e-4
batch = make_batch(cf)
rv1 = net.train_forward(dict(batch), is_validation=True)  # pre-update val fwd
r1 = net.train_forward(dict(batch))
t1 = net.test_forward({'data': batch['data']})
loss1 = float(r1['monitor_values']['loss'])

net2 = build_model(cf, L())
net2.initialize(seed=0)
net2.current_lr = 1e-4
net2.enable_spatial_parallel(2, 4)
rv2 = net2.train_forward(dict(batch), is_validation=True)
r2 = net2.train_forward(dict(batch))
t2 = net2.test_forward({'data': batch['data']})
loss2 = float(r2['monitor_values']['loss'])
print('LOSSES', loss1, loss2)
assert abs(loss1 - loss2) < 1e-5, (loss1, loss2)
# validation forward must route through the SPATIAL loss-eval and agree
assert abs(float(rv1['monitor_values']['loss']) - float(rv2['monitor_values']['loss'])) < 1e-5
np.testing.assert_allclose(t1['seg_preds'], t2['seg_preds'])
print('SPATIAL-WIRING-OK')

# mrcnn exercises the STATIC-flag loss-eval path (with_masks travels
# positionally through the spatial jit) + the sharded two-stage predict
cfm = make_config(model='mrcnn', dim=2, batch_size=4, patch_size=[64, 64], retina_scales=False)
cfm.return_masks_in_val = True
m1 = build_model(cfm, L())
m1.initialize(seed=0)
m1.current_lr = 1e-4
mb = make_batch(cfm)
mv1 = m1.train_forward(dict(mb), is_validation=True)
mt1 = m1.test_forward({'data': mb['data']})
m2 = build_model(cfm, L())
m2.initialize(seed=0)
m2.current_lr = 1e-4
m2.enable_spatial_parallel(2, 2)
mv2 = m2.train_forward(dict(mb), is_validation=True)
mt2 = m2.test_forward({'data': mb['data']})
assert abs(float(mv1['monitor_values']['loss']) - float(mv2['monitor_values']['loss'])) < 1e-5
np.testing.assert_allclose(mt1['seg_preds'], mt2['seg_preds'])
print('SPATIAL-WIRING-MRCNN-OK')
"""
    res = run_cpu_subprocess(code, timeout=3000)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SPATIAL-WIRING-OK" in res.stdout
    assert "SPATIAL-WIRING-MRCNN-OK" in res.stdout


@pytest.mark.slow
def test_gspmd_scan_repro_documents_cap():
    """The GSPMD sub-shard-extent miscompilation the make_spatial_predict cap
    fences must still reproduce exactly as documented (safe region exact,
    fenced region wrong). If a jax upgrade fixes it, this fails and the cap
    can be relaxed; if the failing region MOVES, this also fails — the cap
    must then be re-derived. See tools/gspmd_scan_repro.py."""
    res = run_cpu_subprocess(
        "import runpy, sys; sys.argv=['x']; runpy.run_path('tools/gspmd_scan_repro.py', run_name='__main__')"
    )
    assert "REPRO-PATTERN-HOLDS" in res.stdout, res.stdout[-2000:] + res.stderr[-1000:]


def test_jaxpr_cache_hazard_still_present():
    """jax.jit wrappers of the same function share the global jaxpr cache —
    the reason make_spatial_{predict,train_step} must jit fresh closures
    (trace-time space_fence context reads are otherwise frozen by whichever
    wrapper traced first). If a jax upgrade makes this assert fail, the
    closure workaround is obsolete (but harmless). tools/jaxpr_cache_repro.py."""
    res = run_cpu_subprocess(
        "import runpy, sys; sys.argv=['x']; runpy.run_path('tools/jaxpr_cache_repro.py', run_name='__main__')"
    )
    assert res.returncode == 0, res.stdout[-1000:] + res.stderr[-1000:]


@pytest.mark.slow
def test_sharded_inference_patched_patient_matches_single_device():
    """Test-mode Predictor over a synthetic-LIDC patched patient: with
    cf.n_data_parallel=8 the sharded forward must produce the same boxes
    (scores match to float-reduction-order tolerance, ~1e-6)."""
    code = """
import os, sys, pickle
import numpy as np
sys.path.insert(0, os.getcwd())

from experiments.lidc_exp.preprocessing import generate_synthetic_lidc
from experiments.lidc_exp import data_loader as dl
from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.predictor import Predictor
from medicaldetectiontoolkit_tpu.utils.exp_utils import save_checkpoint
from medicaldetectiontoolkit_tpu.testing import make_config

import tempfile
tmp = tempfile.mkdtemp()

class L:
    def info(self, *a, **k): pass
    def warning(self, *a, **k): pass

synth = os.path.join(tmp, 'data'); os.makedirs(synth)
generate_synthetic_lidc(synth, n_patients=2, shape=(16, 48, 48))

cf = make_config(model='retina_net', dim=2, patch_size=[32, 32], batch_size=8)
cf.pp_data_path = synth; cf.pp_test_data_path = synth
cf.input_df_name = 'info_df.pickle'
cf.exp_dir = tmp; cf.fold_dir = os.path.join(tmp, 'fold_0'); os.makedirs(cf.fold_dir)
cf.fold = 0; cf.hold_out_test_set = True; cf.created_fold_id_pickle = False
cf.select_prototype_subset = None; cf.merge_2D_to_3D_preds = False
cf.n_3D_context = None; cf.test_aug = False; cf.test_n_epochs = 1
cf.max_test_patients = 'all'; cf.class_specific_seg_flag = False
cf.val_mode = 'val_patient'; cf.head_classes = 3
cf.class_dict = {1: 'benign', 2: 'malignant'}

net = build_model(cf, L())
net.initialize(seed=3)
save_checkpoint(os.path.join(cf.fold_dir, '1_best_checkpoint'), {'params': net.params, 'epoch': 1})
np.save(os.path.join(cf.fold_dir, 'epoch_ranking'), np.array([1]))

gen = dl.get_test_generator(cf, L())
patient = next(gen['test'])
assert 'patch_crop_coords' in patient, patient['data'].shape

def boxes_of(results):
    # keyed by (type, coords): coords are device-rounded so they must match
    # exactly; scores carry conv-reduction-order drift (measured ~6e-8), so
    # they are compared with a tolerance instead of rounding (rounding has
    # cliff artifacts at digit boundaries)
    out = []
    for bl in results['boxes']:
        out.append({(str(b['box_type']), tuple(np.asarray(b['box_coords'], float).round(2))):
                    float(b.get('box_score', 0)) for b in bl})
    return out

def assert_boxes_match(a, b, tol=1e-6):
    assert len(a) == len(b)
    for da, db in zip(a, b):
        assert set(da) == set(db), set(da) ^ set(db)
        for k in da:
            assert abs(da[k] - db[k]) < tol, (k, da[k], db[k])

cf.n_data_parallel = None
p1 = Predictor(cf, net, L(), mode='test')
r1 = p1.predict_patient(dict(patient))

cf.n_data_parallel = 8
p8 = Predictor(cf, net, L(), mode='test')
r8 = p8.predict_patient(dict(patient))

assert_boxes_match(boxes_of(r1), boxes_of(r8))
np.testing.assert_array_equal(np.asarray(r1['seg_preds']), np.asarray(r8['seg_preds']))
print('SHARDED-INFER-OK', len(r1['boxes']))

# spatially-partitioned inference through the Predictor: needs patch Y/32
# >= n_space, so re-run the whole thing at patch 64 on a 2x2 mesh and
# compare against ITS single-device baseline (spatial predict is bit-exact)
cf.patch_size = [64, 64]; cf.patch_size_2D = [64, 64]; cf.batch_size = 4
net64 = build_model(cf, L())
net64.initialize(seed=3)
save_checkpoint(os.path.join(cf.fold_dir, '1_best_checkpoint'), {'params': net64.params, 'epoch': 1})
gen = dl.get_test_generator(cf, L())
patient64 = next(gen['test'])

cf.n_data_parallel = None; cf.n_space_parallel = None
rs1 = Predictor(cf, net64, L(), mode='test').predict_patient(dict(patient64))
cf.n_data_parallel = 2; cf.n_space_parallel = 2
rs2 = Predictor(cf, net64, L(), mode='test').predict_patient(dict(patient64))
assert_boxes_match(boxes_of(rs1), boxes_of(rs2))
np.testing.assert_array_equal(np.asarray(rs1['seg_preds']), np.asarray(rs2['seg_preds']))
print('SPATIAL-INFER-PREDICTOR-OK', len(rs1['boxes']))
"""
    res = run_cpu_subprocess(code)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SHARDED-INFER-OK" in res.stdout
    assert "SPATIAL-INFER-PREDICTOR-OK" in res.stdout
