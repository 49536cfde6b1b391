"""Gradient accumulation (cf.grad_accum_steps): exact pins vs a hand loop.

The accumulated step must equal, microbatch for microbatch, a hand-rolled
loop that calls the model's loss on each batch slice with the scan's own
per-microbatch rng keys, averages the gradients and applies one optimizer
update. (Bit-equality with the MONOLITHIC step is impossible by design:
per-element rng splitting and batch-global reductions — batch dice, SHEM
pools — see one microbatch at a time, matching the reference's behavior at
the smaller physical batch.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.models import base, build_model
from medicaldetectiontoolkit_tpu.testing import make_batch, make_config


class _Log:
    def info(self, *a, **k):
        pass


def _tree_allclose(a, b, rtol=2e-5, atol=5e-6):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def _manual_accum_update(net, loss_fn, params, opt_state, rng, lr, batch_arrays, n_micro):
    """The semantics accum_value_and_grad promises, as a plain Python loop."""
    bsz = batch_arrays[0].shape[0]
    m = bsz // n_micro
    rngs = jax.random.split(rng, n_micro)
    gsum = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(n_micro):
        micro = [a[i * m:(i + 1) * m] for a in batch_arrays]
        _, g = jax.value_and_grad(loss_fn, has_aux=True)(params, rngs[i], *micro)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
    grads = jax.tree_util.tree_map(lambda g: g / n_micro, gsum)
    updates, opt_state = net._optimizer.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
    return jax.tree_util.tree_map(lambda p, u: p + u, params, updates), opt_state


def test_retina_net_accum_matches_hand_loop():
    cf = make_config(model="retina_net", dim=2, batch_size=4)
    cf.grad_accum_steps = 2
    net = build_model(cf, _Log())
    net.initialize(seed=0)
    batch = make_batch(cf)
    inputs = net._prep(batch)
    rng = jax.random.PRNGKey(7)
    lr = jnp.float32(1e-3)

    params, opt_state, monitor, heads, anchor_info = net._train_step(
        net.params, net.opt_state, rng, lr, *inputs
    )

    exp_params, _ = _manual_accum_update(
        net,
        lambda p, r, *b: net._losses_and_outputs(p, r, *b),
        net.params, net.opt_state, rng, lr, inputs, 2,
    )
    _tree_allclose(params, exp_params)

    # merged aux keeps the full-batch contract: heads batch-leading, monitor
    # scalars, and detection refinement consumes the merged heads
    assert heads[0].shape[0] == 4 and heads[1].shape[0] == 4
    det, det_mask, _ = net._detect_fn(*heads)
    assert det.shape[0] == 4 and det_mask.shape[0] == 4
    assert np.isfinite(float(monitor["loss"]))


def test_mrcnn_accum_matches_hand_loop():
    cf = make_config(model="mrcnn", dim=2, batch_size=4, retina_scales=False)
    cf.grad_accum_steps = 2
    net = build_model(cf, _Log())
    net.initialize(seed=0)
    batch = make_batch(cf)
    inputs = net._prep(batch)
    rng = jax.random.PRNGKey(3)
    lr = jnp.float32(1e-3)

    params, opt_state, monitor, outs = net._train_step(
        net.params, net.opt_state, rng, lr, *inputs
    )
    exp_params, _ = _manual_accum_update(
        net,
        lambda p, r, *b: net._losses(p, r, *b, with_masks=False),
        net.params, net.opt_state, rng, lr, inputs, 2,
    )
    _tree_allclose(params, exp_params)

    # per-microbatch finalize merged back to full-batch leading dims
    assert outs["det"].shape[0] == 4
    assert outs["sampled_rois"].shape[0] == 4
    assert outs["out_proposals"].shape[0] == 4
    assert np.isfinite(float(monitor["loss"]))


def test_detection_unet_accum_exact_for_per_element_loss():
    # with uniform wce weights and equal microbatches, mean-of-microbatch CE
    # equals full-batch CE, so accumulation matches the MONOLITHIC step too
    cf = make_config(model="detection_unet", dim=2, batch_size=4)
    cf.seg_loss_mode = "wce"
    net_direct = build_model(cf, _Log())
    net_direct.initialize(seed=0)
    batch = make_batch(cf)
    img = base.image_to_device(batch["data"])
    seg = base.seg_to_device(batch["seg"])
    lr = jnp.float32(1e-3)
    p1, _, loss1, smax1 = net_direct._train_step(
        net_direct.params, net_direct.opt_state, lr, img, seg
    )

    cf2 = make_config(model="detection_unet", dim=2, batch_size=4)
    cf2.seg_loss_mode = "wce"
    cf2.grad_accum_steps = 2
    net_accum = build_model(cf2, _Log())
    net_accum.params = net_direct.params
    net_accum.opt_state = net_direct.opt_state
    p2, _, loss2, smax2 = net_accum._train_step(
        net_accum.params, net_accum.opt_state, lr, img, seg
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    _tree_allclose(p1, p2)
    np.testing.assert_allclose(np.asarray(smax1), np.asarray(smax2), rtol=1e-4, atol=1e-5)


def test_resolve_grad_accum_rounds_to_divisor():
    class _Cf:
        grad_accum_steps = 2

    assert base.resolve_grad_accum(_Cf(), 4) == 2
    assert base.resolve_grad_accum(_Cf(), 3) == 1  # --dev odd batch
    _Cf.grad_accum_steps = 6
    assert base.resolve_grad_accum(_Cf(), 4) == 4  # capped at bsz, divisor
    _Cf.grad_accum_steps = 1
    assert base.resolve_grad_accum(_Cf(), 5) == 1


def test_accum_rejects_indivisible_batch():
    with pytest.raises(ValueError, match="not divisible"):
        base.accum_value_and_grad(
            lambda p, r, x: (jnp.sum(p * x), {}),
            jnp.ones(3), jax.random.PRNGKey(0), (jnp.ones((3, 2)),), 2,
        )


def test_retina_unet_accum_end_to_end_contract():
    # seg head on: exercises fused_seg_loss through the scan + the full
    # train_forward results contract
    cf = make_config(model="retina_unet", dim=2, batch_size=4)
    cf.grad_accum_steps = 2
    net = build_model(cf, _Log())
    net.initialize(seed=0)
    batch = make_batch(cf)
    results = net.train_forward(batch)
    assert np.isfinite(results["loss"])
    assert len(results["boxes"]) == 4
    assert results["seg_preds"].shape[0] == 4
    assert "seg dice" in results["logger_string"]
