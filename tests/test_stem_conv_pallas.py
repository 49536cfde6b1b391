"""Exactness of the Pallas banded-GEMM stem conv vs flax nn.Conv.

CPU: interpret mode (kernel semantics; Mosaic limits need the chip — the
hardware compile/parity run is `MDT_TEST_ON_TPU=1 pytest` on this file,
staged in tools/chip_queue.sh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from medicaldetectiontoolkit_tpu.ops.stem_conv_pallas import (
    _banded_ref,
    stem_conv3d,
    stem_pallas_viable,
)

INTERPRET = jax.default_backend() == "cpu"


def _flax_oracle(x, w, b, sy, sx):
    """nn.Conv with pad=k//2 on every axis — the ConvND fallback path."""
    k = w.shape[0]
    conv = nn.Conv(
        w.shape[-1], kernel_size=(k,) * 3, strides=(sy, sx, 1),
        padding=[(k // 2, k // 2)] * 3,
    )
    return conv.apply({"params": {"kernel": w, "bias": b}}, x)


@pytest.mark.parametrize(
    "shape,k,sy,sx",
    [
        ((2, 12, 14, 8, 1), 7, 2, 2),   # stem geometry, even dims
        ((1, 13, 11, 6, 1), 7, 2, 2),   # odd y/x (SAME ceil arithmetic)
        ((2, 10, 10, 8, 2), 5, 2, 2),   # cin=2 (PET-CT dual modality), k=5
        ((1, 8, 8, 4, 1), 3, 1, 1),     # stride-1 degenerate
    ],
)
def test_forward_matches_nn_conv(shape, k, sy, sx):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, shape[-1], 6) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(6) * 0.1, jnp.float32)

    want = _flax_oracle(x, w, b, sy, sx)
    ref = _banded_ref(x, w, b, sy=sy, sx=sx)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), atol=2e-5, rtol=2e-5)

    got = stem_conv3d(x, w, b, sy, sx, INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
    # kernel vs its gradient-source reference: same tap order and f32
    # accumulation, but einsum/dot reassociate — near-ulp, not bit-equal
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gradients_match_nn_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 12, 6, 1), jnp.float32)
    w = jnp.asarray(rng.randn(7, 7, 7, 1, 4) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(4) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(1, 5, 6, 6, 4), jnp.float32)

    def loss_pallas(x, w, b):
        return jnp.vdot(stem_conv3d(x, w, b, 2, 2, INTERPRET), g)

    def loss_flax(x, w, b):
        return jnp.vdot(_flax_oracle(x, w, b, 2, 2), g)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gf = jax.grad(loss_flax, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(gp, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=3e-4, rtol=3e-4)


def test_wgrad_kernel_matches_einsum():
    """The tap-outer accumulating dT kernel == the per-tap einsum dT."""
    from medicaldetectiontoolkit_tpu.ops.stem_conv_pallas import (
        _band_T, _pad_phases, _stem_pallas_wgrad,
    )

    rng = np.random.RandomState(4)
    k, sy, sx = 5, 2, 2
    x = jnp.asarray(rng.randn(2, 11, 9, 6, 1), jnp.float32)
    B, Y, X, Z, cin = x.shape
    Yo, Xo = -(-Y // sy), -(-X // sx)
    g2 = jnp.asarray(rng.randn(B, Yo, Xo, Z * 4), jnp.float32)

    got = _stem_pallas_wgrad(x, g2, k, sy, sx, INTERPRET)

    ph = _pad_phases(x, k, sy, sx)
    want = []
    for ky in range(k):
        for kx in range(k):
            a = jax.lax.dynamic_slice_in_dim(ph[kx % sx], kx // sx, Xo, axis=2)
            a = a[:, ky : ky + sy * (Yo - 1) + 1 : sy]
            want.append(jnp.einsum("byxc,byxn->cn", a, g2,
                                   preferred_element_type=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.stack(want)), atol=1e-4, rtol=1e-5
    )


def test_bfloat16_forward_close():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 8, 1), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 7, 1, 4) * 0.2, jnp.bfloat16)
    b = jnp.asarray(rng.randn(4) * 0.1, jnp.bfloat16)
    got = stem_conv3d(x, w, b, 2, 2, INTERPRET)
    ref = _banded_ref(x, w, b)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )


def test_convnd_dispatch_param_compatible(monkeypatch):
    """MDT_STEM_PALLAS=1 routes the 3D stem through _StemPallasConv with
    nn.Conv-identical param names/shapes and matching outputs."""
    from medicaldetectiontoolkit_tpu.models.backbone import ConvND

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 12, 12, 8, 1), jnp.float32)

    def init_apply():
        m = ConvND(dim=3, features=4, ks=7, stride=(2, 2, 1), pad=3, relu=None)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        return m, params

    monkeypatch.delenv("MDT_STEM_PALLAS", raising=False)
    m0, p0 = init_apply()
    out0 = m0.apply(p0, x)

    monkeypatch.setenv("MDT_STEM_PALLAS", "1")
    m1, p1 = init_apply()
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, c in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        assert a.shape == c.shape
    # same checkpoint, either path: apply the default-path params via Pallas
    out1 = m1.apply(p0, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_train_step_integration(monkeypatch):
    """Full 3D retina_unet train step (remat over the custom_vjp, anchor
    matching, SHEM, Adam) with MDT_STEM_PALLAS=1 matches the default path."""
    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.testing import make_batch, make_config

    class _Log:
        def info(self, *a, **k):
            pass

        def __getattr__(self, name):
            return self.info

    def one_step(stem_pallas):
        if stem_pallas:
            monkeypatch.setenv("MDT_STEM_PALLAS", "1")
        else:
            monkeypatch.delenv("MDT_STEM_PALLAS", raising=False)
        cf = make_config(model="retina_unet", dim=3, batch_size=1, patch_size=[64, 64, 8])
        cf.use_remat = True
        net = build_model(cf, _Log())
        net.initialize(seed=5)
        out = net.train_forward(make_batch(cf, seed=9))
        return out["monitor_values"]["loss"]

    base_loss = one_step(False)
    pallas_loss = one_step(True)
    np.testing.assert_allclose(pallas_loss, base_loss, rtol=2e-4, atol=2e-4)


def test_viability_gate():
    # LIDC stem: viable
    assert stem_pallas_viable((4, 128, 128, 64, 1), 7, (2, 2, 1), 3)
    # z-strided stem: not expressible (band assumes z stride 1)
    assert not stem_pallas_viable((4, 128, 128, 64, 1), 7, (2, 2, 2), 3)
    # VALID-padding conv: geometry contract violated
    assert not stem_pallas_viable((4, 128, 128, 64, 1), 7, (2, 2, 1), 0)
    # huge Z*cin: banded weight would blow VMEM
    assert not stem_pallas_viable((1, 64, 64, 256, 4), 7, (2, 2, 1), 3)
