"""Pallas pyramid RoIAlign vs. the XLA oracle (interpret mode off-TPU).

Pins the level-routed kernel (``ops/roi_align_pallas.py``) to the
crop-every-level XLA formulation, which itself is pinned to the NumPy port of
the reference CUDA kernel in ``tests/test_roi_align.py``; plus gradient
checks of the custom VJP against autodiff of the oracle and numeric diffs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medicaldetectiontoolkit_tpu.ops import roi_align_pallas as P

INTERPRET = jax.default_backend() not in ("tpu", "axon")


def make_pyramid(rng, dim, B=2, C=8, L=3):
    base = (16, 16, 8)[:dim]
    fms = []
    for lvl in range(L):
        sp = tuple(max(1, s // (2 ** lvl)) for s in base)
        fms.append(jnp.array(rng.randn(B, *sp, C).astype(np.float32)))
    return fms


def make_rois(rng, dim, R, B, L):
    lo = rng.rand(R, dim) * 0.6
    hi = lo + rng.rand(R, dim) * 0.4
    cols = [lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]]
    if dim == 3:
        cols += [lo[:, 2], hi[:, 2]]
    boxes = jnp.array(np.stack(cols, -1).astype(np.float32))
    bix = jnp.array(rng.randint(0, B, R).astype(np.int32))
    lvl = jnp.array(rng.randint(0, L, R).astype(np.int32))
    return boxes, bix, lvl


@pytest.mark.parametrize("dim,crop", [(2, (5, 5)), (2, (7, 7)), (3, (7, 7, 3)), (3, (3, 3, 2))])
def test_matches_xla_oracle(rng, dim, crop):
    fms = make_pyramid(rng, dim)
    boxes, bix, lvl = make_rois(rng, dim, R=13, B=2, L=3)
    want = P.pyramid_roi_align_xla(fms, boxes, bix, lvl, crop)
    got = P.pyramid_roi_align_pallas(fms, boxes, bix, lvl, crop, interpret=INTERPRET)
    # lerp association matches the oracle exactly; residual ~1e-6 relative
    # differences come from compiler FMA contraction choices, not logic
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_single_level_crop1_edge(rng):
    # crop == 1 along z exercises the box-center sampling branch
    fms = make_pyramid(rng, 3, L=1)
    boxes, bix, lvl = make_rois(rng, 3, R=6, B=2, L=1)
    want = P.pyramid_roi_align_xla(fms, boxes, bix, lvl, (4, 4, 1))
    got = P.pyramid_roi_align_pallas(fms, boxes, bix, lvl, (4, 4, 1), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_out_of_range_boxes_clamped(rng):
    # coords beyond [0, 1] must clamp exactly like the oracle (kernel edge rows)
    fms = make_pyramid(rng, 2, L=2)
    boxes = jnp.array([[-0.2, -0.3, 1.4, 1.2], [0.9, 0.9, 1.1, 1.3]], jnp.float32)
    bix = jnp.array([0, 1], jnp.int32)
    lvl = jnp.array([0, 1], jnp.int32)
    want = P.pyramid_roi_align_xla(fms, boxes, bix, lvl, (4, 4))
    got = P.pyramid_roi_align_pallas(fms, boxes, bix, lvl, (4, 4), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dim,crop", [(2, (5, 5)), (3, (4, 4, 2))])
def test_vjp_matches_oracle_autodiff(rng, dim, crop):
    fms = make_pyramid(rng, dim)
    boxes, bix, lvl = make_rois(rng, dim, R=9, B=2, L=3)
    cot = jnp.array(rng.randn(9, *crop, fms[0].shape[-1]).astype(np.float32))

    def auto_loss(fms_):
        return jnp.vdot(P.pyramid_roi_align(fms_, boxes, bix, lvl, crop), cot)

    def oracle_loss(fms_):
        return jnp.vdot(P.pyramid_roi_align_xla(fms_, boxes, bix, lvl, crop), cot)

    g_auto = jax.grad(auto_loss)(fms)
    g_oracle = jax.grad(oracle_loss)(fms)
    for ga, go in zip(g_auto, g_oracle):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(go), rtol=1e-6, atol=1e-6)


def test_vjp_numeric_diff(rng):
    # central-difference check on a few feature-map entries
    fms = make_pyramid(rng, 2, B=1, C=4, L=2)
    boxes, bix, lvl = make_rois(rng, 2, R=4, B=1, L=2)
    crop = (3, 3)
    cot = jnp.array(rng.randn(4, *crop, 4).astype(np.float32))

    def loss(f0):
        return jnp.vdot(P.pyramid_roi_align([f0, fms[1]], boxes, bix, lvl, crop), cot)

    g = np.asarray(jax.grad(loss)(fms[0]))
    eps = 1e-3
    f0 = np.asarray(fms[0])
    for idx in [(0, 3, 4, 1), (0, 8, 2, 0), (0, 15, 15, 3)]:
        bump = np.zeros_like(f0)
        bump[idx] = eps
        hi = loss(jnp.array(f0 + bump))
        loL = loss(jnp.array(f0 - bump))
        num = (float(hi) - float(loL)) / (2 * eps)
        np.testing.assert_allclose(g[idx], num, rtol=1e-2, atol=1e-3)

def test_chunked_large_R_matches_oracle(rng, monkeypatch):
    # force the SMEM chunking path (real-hardware limit: the scalar-prefetch
    # operands of a batch*post_nms_rois Mask R-CNN call exceed SMEM)
    monkeypatch.setattr(P, "_MAX_SMEM_BYTES", P._bytes_per_roi((5, 5)) * 4)
    fms = make_pyramid(rng, 2)
    boxes, bix, lvl = make_rois(rng, 2, R=11, B=2, L=3)  # 3 chunks of 4 + pad
    want = P.pyramid_roi_align_xla(fms, boxes, bix, lvl, (5, 5))
    got = P.pyramid_roi_align_pallas(fms, boxes, bix, lvl, (5, 5), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)


def test_vjp_bf16_feature_maps(rng):
    # Regression: with bf16 feature maps the Pallas forward preserves bf16
    # while the XLA oracle promotes to f32 (f32 lerp weights), so on TPU the
    # custom-VJP backward used to receive a bf16 cotangent that the oracle's
    # pullback rejected (ValueError: unexpected JAX type) — hit by the 3D
    # Mask R-CNN train step under compute_dtype=bfloat16 (mask/classify RoI
    # pooling on bf16 FPN maps). The bwd now casts the cotangent to the
    # oracle's output dtype.
    fms = [f.astype(jnp.bfloat16) for f in make_pyramid(rng, 3)]
    boxes, bix, lvl = make_rois(rng, 3, R=9, B=2, L=3)
    crop = (4, 4, 2)

    # direct bwd-helper check (backend-independent: simulates the TPU-path
    # aval where the forward output dtype equals the feature dtype)
    cot = jnp.array(rng.randn(9, *crop, fms[0].shape[-1]), jnp.bfloat16)
    d_fms, _, _, _ = P._pyramid_bwd(crop, (fms, boxes, bix, lvl), cot)
    for d, f in zip(d_fms, fms):
        assert d.shape == f.shape and d.dtype == jnp.bfloat16

    # end-to-end grad through the public dispatcher (on TPU this exercises
    # the real Pallas forward + oracle backward; on CPU the XLA forward).
    # Both backends must promote bf16 features to f32 output (the Pallas path
    # upcasts: Mosaic rejects the kernel's dynamic z-gather on bf16 tiling).
    out = P.pyramid_roi_align(fms, boxes, bix, lvl, crop)
    assert out.dtype == jnp.float32

    def loss(fms_):
        return jnp.sum(P.pyramid_roi_align(fms_, boxes, bix, lvl, crop))

    g = jax.grad(loss)(fms)
    for gl, f in zip(g, fms):
        assert gl.dtype == f.dtype
        assert bool(jnp.isfinite(gl.astype(jnp.float32)).all())
