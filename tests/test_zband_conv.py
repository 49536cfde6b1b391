"""Full-z banded conv == nn.Conv, fwd + grads, params interchangeable.

``_ZBandedConv`` (models/backbone.py) reformulates a tiny-cin 3D conv as a
2D conv whose contraction carries the whole z axis (K = Z*cin,
N = Zo*cout) — the MXU-shaped alternative to XLA's lane-padded small-channel
3D conv. These tests force ``zband`` explicitly (the auto policy is off on
CPU backends) and pin exact-reformulation semantics: same param tree, same
outputs, same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.models import backbone as bb


def _make(cin, cout, ks, stride, pad, zband):
    return bb.ConvND(dim=3, features=cout, ks=ks, stride=stride, pad=pad,
                     norm=None, relu=None, zband=zband, zfold=1)


CASES = [
    # cin, cout, ks, stride, pad, spatial
    (1, 18, 7, (2, 2, 1), 3, (16, 16, 32)),   # LIDC mrcnn stem geometry
    (1, 18, 3, (1, 1, 1), 1, (12, 12, 32)),   # c0 full-res conv
    (3, 18, 7, (2, 2, 1), 3, (12, 12, 32)),   # n_3D_context stem
    (2, 16, 3, (1, 1, 1), 1, (10, 10, 32)),   # PET-CT dual modality
    (4, 8, 5, (1, 1, 2), 2, (8, 8, 32)),      # strided z
    (1, 6, 3, (2, 2, 2), 1, (8, 8, 33)),      # z not divisible by stride
]


class TestZBandEquivalence:
    @pytest.mark.parametrize("cin,cout,ks,stride,pad,spatial", CASES)
    def test_forward_matches_plain(self, cin, cout, ks, stride, pad, spatial):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, *spatial, cin).astype(np.float32))
        ref = _make(cin, cout, ks, stride, pad, zband=False)
        band = _make(cin, cout, ks, stride, pad, zband=True)
        params = jax.jit(ref.init)(jax.random.PRNGKey(1), x)
        out_ref = jax.jit(ref.apply)(params, x)
        out_band = jax.jit(band.apply)(params, x)
        assert out_ref.shape == out_band.shape
        np.testing.assert_allclose(np.asarray(out_band), np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 8, 8, 32, 1))
        p_ref = jax.jit(_make(1, 18, 7, (2, 2, 1), 3, zband=False).init)(jax.random.PRNGKey(0), x)
        p_band = jax.jit(_make(1, 18, 7, (2, 2, 1), 3, zband=True).init)(jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, p_ref)
        band_shapes = jax.tree_util.tree_map(lambda a: a.shape, p_band)
        assert ref_shapes == band_shapes
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
            p_ref, p_band)

    def test_gradients_match(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 8, 8, 32, 1).astype(np.float32))
        ref = _make(1, 18, 7, (2, 2, 1), 3, zband=False)
        band = _make(1, 18, 7, (2, 2, 1), 3, zband=True)
        params = jax.jit(ref.init)(jax.random.PRNGKey(3), x)
        cot_shape = jax.eval_shape(lambda p, xx: ref.apply(p, xx), params, x).shape
        cot = jnp.asarray(rng.randn(*cot_shape).astype(np.float32))

        def loss(mod, p, xx):
            return jnp.sum(mod.apply(p, xx) * cot)

        gp_ref, gx_ref = jax.jit(jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1)))(params, x)
        gp_band, gx_band = jax.jit(jax.grad(lambda p, xx: loss(band, p, xx), argnums=(0, 1)))(params, x)
        np.testing.assert_allclose(np.asarray(gx_band), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4),
            gp_band, gp_ref)

    def test_policy_default_off(self):
        # demoted to opt-in by the round-4 hardware A/B (ab_nozband 245.0 ms
        # beat ab_base 263.9 ms at the full LIDC step)
        assert not bb._zband_policy(1, 64, 7)

    def test_policy_gates_when_opted_in(self, monkeypatch):
        monkeypatch.setenv("MDT_ZBAND", "1")
        assert bb._zband_policy(1, 64, 7)          # LIDC stem
        assert bb._zband_policy(4, 32, 3)          # small-cin full-res conv
        assert not bb._zband_policy(18, 64, 7)     # wide cin: stay on zfold
        assert not bb._zband_policy(1, 8, 3)       # tiny z: not worth it
        assert not bb._zband_policy(1, 64, 1)      # 1x1x1: no banding

    def test_env_kill_switch(self, monkeypatch):
        monkeypatch.setenv("MDT_ZBAND", "1")
        monkeypatch.setenv("MDT_NO_ZBAND", "1")
        assert not bb._zband_policy(1, 64, 7)


def _make_block(cin, cout, ks, stride, pad, zblock):
    return bb.ConvND(dim=3, features=cout, ks=ks, stride=stride, pad=pad,
                     norm=None, relu=None, zblock=zblock, zband=False, zfold=1)


BLOCK_CASES = [
    # cin, cout, ks, stride, pad, G, spatial
    (18, 18, 7, (2, 2, 1), 3, 7, (16, 16, 32)),   # retina_unet stem geometry
    (18, 18, 3, (1, 1, 1), 1, 7, (12, 12, 32)),   # c0 conv2
    (18, 36, 3, (1, 1, 1), 1, 8, (10, 10, 32)),   # G divides zo
    (8, 16, 5, (1, 1, 2), 2, 4, (8, 8, 32)),      # strided z
    (18, 18, 3, (2, 2, 2), 1, 7, (8, 8, 33)),     # odd z, strided
]


class TestZBlockBandEquivalence:
    @pytest.mark.parametrize("cin,cout,ks,stride,pad,G,spatial", BLOCK_CASES)
    def test_forward_matches_plain(self, cin, cout, ks, stride, pad, G, spatial):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, *spatial, cin).astype(np.float32))
        ref = _make_block(cin, cout, ks, stride, pad, zblock=0)
        blk = _make_block(cin, cout, ks, stride, pad, zblock=G)
        params = jax.jit(ref.init)(jax.random.PRNGKey(1), x)
        out_ref = jax.jit(ref.apply)(params, x)
        out_blk = jax.jit(blk.apply)(params, x)
        assert out_ref.shape == out_blk.shape
        np.testing.assert_allclose(np.asarray(out_blk), np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_gradients_match(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 8, 8, 32, 18).astype(np.float32))
        ref = _make_block(18, 18, 3, (1, 1, 1), 1, zblock=0)
        blk = _make_block(18, 18, 3, (1, 1, 1), 1, zblock=7)
        params = jax.jit(ref.init)(jax.random.PRNGKey(3), x)
        cot_shape = jax.eval_shape(lambda p, xx: ref.apply(p, xx), params, x).shape
        cot = jnp.asarray(rng.randn(*cot_shape).astype(np.float32))

        def loss(mod, p, xx):
            return jnp.sum(mod.apply(p, xx) * cot)

        gp_ref, gx_ref = jax.jit(jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1)))(params, x)
        gp_blk, gx_blk = jax.jit(jax.grad(lambda p, xx: loss(blk, p, xx), argnums=(0, 1)))(params, x)
        np.testing.assert_allclose(np.asarray(gx_blk), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4),
            gp_blk, gp_ref)


@pytest.mark.slow
def test_full_3d_model_with_tpu_auto_policy(monkeypatch):
    """Simulate the TPU backend policy on CPU: the whole 3D mrcnn train step
    must run with zband+zfold auto-dispatch active and produce the same loss
    as the plain-conv path (same params, same rng) to float tolerance.
    Pre-validates the exact program the chip will compile."""
    import jax.numpy as jnp
    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.testing import make_batch, make_config

    class _Log:
        def info(self, *a, **k):
            pass

    cf = make_config("mrcnn", dim=3, patch_size=[32, 32, 32], retina_scales=False)
    batch = make_batch(cf)

    def loss_with_policy(enabled):
        monkeypatch.setattr(bb, "_zfold_backend_default", lambda: enabled)
        net = build_model(cf, _Log())
        net.initialize(seed=0)
        res = net.train_forward(batch, do_update=False)
        return res["loss"]

    plain = loss_with_policy(False)
    folded = loss_with_policy(True)
    assert np.isfinite(folded)
    np.testing.assert_allclose(folded, plain, rtol=2e-3, atol=2e-3)
