"""Device-mesh parallelism.

The reference is strictly single-GPU (``net.cuda()`` pins device 0,
``exec.py:38``; no DP/DDP/TP/NCCL anywhere — SURVEY §2.3). Scale-out here is
TPU-native SPMD: a ``jax.sharding.Mesh`` + NamedSharding annotations turn the
existing jitted train step into data-parallel execution with XLA-inserted
gradient all-reduces over ICI — no hand-written communication layer.
"""

from medicaldetectiontoolkit_tpu.parallel.mesh import (  # noqa: F401
    get_mesh,
    get_mesh_2d,
    host_shard_info,
    make_data_parallel_predict,
    make_data_parallel_step,
    make_spatial_predict,
    make_spatial_train_step,
    maybe_initialize_distributed,
    shard_batch,
    shard_spatial,
)
