"""Multi-HOST (multi-process) tests: 2 CPU processes x 4 virtual devices form
one 8-device global mesh via jax.distributed (gloo collectives on CPU).

Proves SURVEY §2.3's DCN story end-to-end: ``maybe_initialize_distributed``
brings up the processes, ``host_shard_info`` feeds each host a disjoint
patient shard, and one data-parallel train step over the global mesh produces
the same loss as the single-process run on the concatenated batch.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
rank = int(sys.argv[1])
os.environ["MDT_DIST_COORD"] = sys.argv[2]
os.environ["MDT_DIST_NPROCS"] = "2"
os.environ["MDT_DIST_RANK"] = str(rank)

from medicaldetectiontoolkit_tpu.parallel import (
    get_mesh, host_shard_info, make_data_parallel_step,
    maybe_initialize_distributed, shard_batch,
)
from medicaldetectiontoolkit_tpu.parallel.mesh import replicate_tree
assert maybe_initialize_distributed() is True
import jax, numpy as np
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

# host_shard_info: disjoint patient shards per host
ids = [p for p in range(10)]
r, w = host_shard_info()
assert (r, w) == (rank, 2)
mine = ids[r::w]
print("SHARD", rank, mine, flush=True)

# global batch = both ranks' halves of the same deterministic batch
cf = make_config(model="retina_net", dim=2, batch_size=8, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch["data"])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
    batch["bb_target"], batch["roi_labels"], 8, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch["seg"])
lo, hi = rank * 4, rank * 4 + 4  # this host's local slice (global batch 8)

mesh = get_mesh(4)

# establish the gloo context with a trivial collective BEFORE the big
# compile: context init has a ~30 s rendezvous timeout, and compile/cache
# skew between the two processes can exceed it; once connected, later
# collectives block on peers without that deadline
from jax.sharding import NamedSharding, PartitionSpec as P
warm = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(
    shard_batch(mesh, np.arange(16, dtype=np.float32).reshape(4, 4)[rank * 2:rank * 2 + 2]))
assert float(warm) == 120.0, float(warm)

step = make_data_parallel_step(net, mesh)
params = replicate_tree(mesh, net.params)
opt = replicate_tree(mesh, net.opt_state)
rng = replicate_tree(mesh, jax.random.PRNGKey(7))
lr = replicate_tree(mesh, jnp.float32(1e-4))
simg, sb, si, sv, ss = shard_batch(
    mesh, np.asarray(img)[lo:hi], np.asarray(gt_boxes)[lo:hi],
    np.asarray(gt_ids)[lo:hi], np.asarray(gt_valid)[lo:hi], np.asarray(seg)[lo:hi])
out = step(params, opt, rng, lr, simg, sb, si, sv, ss)
loss = float(out[2]["loss"])
print("LOSS", rank, repr(loss), flush=True)
"""

SINGLE = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model="retina_net", dim=2, batch_size=8, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch["data"])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
    batch["bb_target"], batch["roi_labels"], 8, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch["seg"])
out = net._train_step_fn(net.params, net.opt_state, jax.random.PRNGKey(7),
                         jnp.float32(1e-4), img, gt_boxes, gt_ids, gt_valid, seg)
print("LOSS", repr(float(out[2]["loss"])), flush=True)
"""


WORKER_SPATIAL = """
import os, sys
rank = int(sys.argv[1])
os.environ["MDT_DIST_COORD"] = sys.argv[2]
os.environ["MDT_DIST_NPROCS"] = "2"
os.environ["MDT_DIST_RANK"] = str(rank)

from medicaldetectiontoolkit_tpu.parallel import (
    get_mesh_2d, make_spatial_train_step, maybe_initialize_distributed,
    shard_spatial,
)
from medicaldetectiontoolkit_tpu.parallel.mesh import replicate_tree
assert maybe_initialize_distributed() is True
import jax, numpy as np
import jax.numpy as jnp
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

# 2 data (across hosts) x 2 space (inside each host): the grad all-reduce
# rides the cross-host axis, conv halo exchanges stay host-local
cf = make_config(model="retina_net", dim=2, batch_size=2, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = np.asarray(model_base.image_to_device(batch["data"]))
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
    batch["bb_target"], batch["roi_labels"], 2, 2, cf.max_gt_boxes)
seg = np.asarray(model_base.seg_to_device(batch["seg"]))

mesh = get_mesh_2d(2, 2)

from jax.sharding import NamedSharding, PartitionSpec as P
warm = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(
    shard_spatial(mesh, np.ones((2, 2), np.float32)))
assert float(warm) == 4.0, float(warm)

step = make_spatial_train_step(net, mesh)
out = step(
    replicate_tree(mesh, net.params),
    replicate_tree(mesh, net.opt_state),
    replicate_tree(mesh, jax.random.PRNGKey(7)),
    replicate_tree(mesh, jnp.float32(1e-4)),
    shard_spatial(mesh, img, y_dim=1),
    shard_spatial(mesh, np.asarray(gt_boxes), y_dim=None),
    shard_spatial(mesh, np.asarray(gt_ids), y_dim=None),
    shard_spatial(mesh, np.asarray(gt_valid), y_dim=None),
    shard_spatial(mesh, seg, y_dim=2),
)
print("LOSS", rank, repr(float(out[2]["loss"])), flush=True)
"""

SINGLE_SPATIAL = """
import jax, numpy as np
import jax.numpy as jnp
from medicaldetectiontoolkit_tpu.models import build_model, base as model_base
from medicaldetectiontoolkit_tpu.testing import make_config, make_batch

class L:
    def info(self, *a, **k): pass

cf = make_config(model="retina_net", dim=2, batch_size=2, patch_size=[64, 64])
net = build_model(cf, L())
net.initialize(seed=0)
batch = make_batch(cf)
img = model_base.image_to_device(batch["data"])
gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
    batch["bb_target"], batch["roi_labels"], 2, 2, cf.max_gt_boxes)
seg = model_base.seg_to_device(batch["seg"])
out = net._train_step_fn(net.params, net.opt_state, jax.random.PRNGKey(7),
                         jnp.float32(1e-4), img, gt_boxes, gt_ids, gt_valid, seg)
print("LOSS", repr(float(out[2]["loss"])), flush=True)
"""


def _env(extra_devices=4):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={extra_devices}"
    ).strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(worker=WORKER):
    """Spawn the 2-process job under a box-wide file lock.

    The lock serializes every multihost spawn on this machine (other pytest
    processes, the chip queue's suite run): gloo's rendezvous + shutdown
    barriers are wall-clock-bounded, and two 2-process jobs time-slicing one
    CPU core reliably blow the 30 s deadline (round-4's only suite failure).
    """
    import fcntl

    with open("/tmp/mdt_multihost.lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        coord = f"127.0.0.1:{_free_port()}"
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", worker, str(rank), coord],
                cwd=REPO, env=_env(2), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
            for rank in range(2)
        ]
        outs, errs, rcs = [], [], []
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append(out)
            errs.append(err)
            rcs.append(p.returncode)
        return outs, errs, rcs


def _is_contention_flake(errs):
    return any(
        "Gloo" in e or "DEADLINE" in e or "Timed out" in e or "timed out" in e
        for e in errs
    )


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    outs, errs, rcs = _run_workers()
    if any(rc != 0 for rc in rcs) and _is_contention_flake(errs):
        # gloo's ~30 s rendezvous can time out under heavy host contention
        # (1-CPU CI boxes running the suite in parallel); one clean retry
        outs, errs, rcs = _run_workers()
    for rc, err in zip(rcs, errs):
        assert rc == 0, err[-3000:]

    # disjoint patient shards
    assert "SHARD 0 [0, 2, 4, 6, 8]" in outs[0]
    assert "SHARD 1 [1, 3, 5, 7, 9]" in outs[1]

    losses = [float(o.split("LOSS")[-1].split()[1]) for o in outs]
    assert losses[0] == losses[1], losses  # replicated output: bit-identical

    res = subprocess.run(
        [sys.executable, "-c", SINGLE], cwd=REPO, env=_env(1),
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    single = float(res.stdout.split("LOSS")[-1].split()[0])
    assert abs(single - losses[0]) < 1e-5, (single, losses[0])


@pytest.mark.slow
def test_two_process_spatial_train_step_matches_single_process():
    """Spatially-sharded training over a cross-host 2D (data x space) mesh:
    2 processes x 2 virtual devices, batch on the cross-host 'data' axis,
    image Y split host-locally on 'space'. The replicated monitor loss must
    match the plain single-device step on the same batch."""
    outs, errs, rcs = _run_workers(WORKER_SPATIAL)
    if any(rc != 0 for rc in rcs) and _is_contention_flake(errs):
        outs, errs, rcs = _run_workers(WORKER_SPATIAL)
    for rc, err in zip(rcs, errs):
        assert rc == 0, err[-3000:]

    losses = [float(o.split("LOSS")[-1].split()[1]) for o in outs]
    assert losses[0] == losses[1], losses  # replicated output: bit-identical

    res = subprocess.run(
        [sys.executable, "-c", SINGLE_SPATIAL], cwd=REPO, env=_env(1),
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    single = float(res.stdout.split("LOSS")[-1].split()[0])
    assert abs(single - losses[0]) < 1e-5, (single, losses[0])
