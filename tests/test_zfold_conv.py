"""z space-to-depth folded conv == nn.Conv, fwd + grads, params interchangeable.

The folded path (models/backbone._ZFoldedConv) is the TPU lane-fill
reformulation of small-channel 3D convs; these tests force ``zfold`` explicitly
(the auto policy is off on CPU backends) and pin exact-reformulation semantics:
same param tree, same outputs, same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.models import backbone as bb


def _make(dim, cin, cout, ks, stride, pad, zfold):
    return bb.ConvND(dim=dim, features=cout, ks=ks, stride=stride, pad=pad,
                     norm=None, relu=None, zfold=zfold)


CASES = [
    # cin, cout, ks, stride, pad, zfold, spatial (3D: fold z; 2D: fold x)
    (1, 18, 3, (1, 1, 1), 1, 4, (12, 12, 16)),
    (18, 18, 3, (1, 1, 1), 1, 4, (10, 10, 16)),
    (18, 18, 7, (2, 2, 1), 3, 4, (12, 12, 16)),
    (36, 36, 3, (1, 1, 1), 1, 2, (8, 8, 16)),
    (18, 36, 1, (1, 1, 1), 0, 4, (6, 6, 16)),
    (18, 18, 3, (1, 1, 1), 1, 2, (6, 6, 18)),  # z not a multiple of f
    (18, 18, 3, (1, 1, 2), 1, 2, (6, 6, 16)),  # strided folded axis (3D)
    (1, 18, 3, (1, 1), 1, 4, (16, 32)),  # 2D: x folds
    (18, 18, 7, (2, 2), 3, 4, (32, 32)),  # 2D strided stem geometry
    (36, 36, 3, (1, 1), 1, 2, (16, 24)),
    (18, 36, 1, (1, 1), 0, 4, (8, 16)),
]


class TestZFoldEquivalence:
    @pytest.mark.parametrize("cin,cout,ks,stride,pad,zfold,spatial", CASES)
    def test_forward_matches_unfolded(self, cin, cout, ks, stride, pad, zfold, spatial):
        rng = np.random.RandomState(0)
        dim = len(spatial)
        x = jnp.asarray(rng.randn(2, *spatial, cin).astype(np.float32))
        ref = _make(dim, cin, cout, ks, stride, pad, zfold=1)
        fold = _make(dim, cin, cout, ks, stride, pad, zfold=zfold)
        params = jax.jit(ref.init)(jax.random.PRNGKey(1), x)
        # identical param tree: the folded module reuses the same params
        out_ref = jax.jit(ref.apply)(params, x)
        out_fold = jax.jit(fold.apply)(params, x)
        assert out_ref.shape == out_fold.shape
        np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 8, 8, 16, 18))
        p_ref = jax.jit(_make(3, 18, 18, 3, (1, 1, 1), 1, 1).init)(jax.random.PRNGKey(0), x)
        p_fold = jax.jit(_make(3, 18, 18, 3, (1, 1, 1), 1, 4).init)(jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, p_ref)
        fold_shapes = jax.tree_util.tree_map(lambda a: a.shape, p_fold)
        assert ref_shapes == fold_shapes
        # identical init draws too (same RNG fold-in path)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
            p_ref, p_fold)

    def test_gradients_match(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 8, 8, 16, 18).astype(np.float32))
        cot = jnp.asarray(rng.randn(2, 8, 8, 16, 18).astype(np.float32))
        ref = _make(3, 18, 18, 3, (1, 1, 1), 1, zfold=1)
        fold = _make(3, 18, 18, 3, (1, 1, 1), 1, zfold=4)
        params = jax.jit(ref.init)(jax.random.PRNGKey(3), x)

        def loss(mod, p, xx):
            return jnp.sum(mod.apply(p, xx) * cot)

        gp_ref, gx_ref = jax.jit(jax.grad(lambda p, xx: loss(ref, p, xx), argnums=(0, 1)))(params, x)
        gp_fold, gx_fold = jax.jit(jax.grad(lambda p, xx: loss(fold, p, xx), argnums=(0, 1)))(params, x)
        np.testing.assert_allclose(np.asarray(gx_fold), np.asarray(gx_ref), rtol=1e-4, atol=1e-4)
        jax.tree_util.tree_map(
            lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4),
            gp_fold, gp_ref)

    def test_policy_gates(self):
        # tiny axes and wide channels never fold; strided axes may
        assert bb._zfold_policy(18, 18, 8, 3, 1) == 1
        assert bb._zfold_policy(64, 64, 64, 3, 1) == 1
        assert bb._zfold_policy(18, 18, 64, 3, 1) == 4
        assert bb._zfold_policy(18, 18, 64, 7, 2) == 4
        assert bb._zfold_policy(36, 36, 64, 3, 1) == 2
        assert bb._zfold_policy(1, 18, 64, 3, 1) == 4
