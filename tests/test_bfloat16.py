"""bfloat16 conv-stack training: finite losses, fp32 loss path, learning."""

import numpy as np

from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.testing import make_batch, make_config


class _Log:
    def info(self, *a, **k):
        pass


def test_bf16_retina_trains():
    cf = make_config("retina_net", dim=2)
    cf.compute_dtype = "bfloat16"
    net = build_model(cf, _Log())
    net.initialize()
    net.current_lr = 3e-4
    batch = make_batch(cf)
    losses = [net.train_forward(batch)["loss"] for _ in range(10)]
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_bf16_remat_equivalence():
    """remat must not change the loss value given IDENTICAL params.

    (nn.remat changes module paths and therefore init RNG streams, so params
    are copied from the non-remat model rather than re-initialized.)
    """
    import jax

    cf0 = make_config("retina_net", dim=2)
    cf0.use_remat = False
    net0 = build_model(cf0, _Log())
    net0.initialize(seed=7)

    cf1 = make_config("retina_net", dim=2)
    cf1.use_remat = True
    net1 = build_model(cf1, _Log())
    net1.initialize(seed=7)

    # maybe_remat preserves module names, so param trees are identical and
    # checkpoints stay loadable across remat settings
    s0 = jax.tree_util.tree_structure(net0.params)
    s1 = jax.tree_util.tree_structure(net1.params)
    assert s0 == s1, "remat changed the param tree structure"
    net1.load_params(jax.device_get(net0.params))

    batch = make_batch(cf0)
    l0 = net0.train_forward(batch, is_validation=True)["loss"]
    l1 = net1.train_forward(batch, is_validation=True)["loss"]
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
