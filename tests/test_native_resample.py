"""Native C++ augmentation kernels == scipy.ndimage, on random + edge cases.

The native library auto-builds on first use (g++, see native/build.sh); if
no toolchain is present these tests exercise the scipy fallback path and
still pass (get_lib() returning None makes the wrappers call scipy).
"""

import os

import numpy as np
import pytest
from scipy import ndimage

from medicaldetectiontoolkit_tpu import native


def _coords(rng, dim, shape, n=2000):
    # spread beyond the volume so constant-border handling is exercised
    return np.stack([
        rng.uniform(-3.0, shape[d] + 2.0, size=n) for d in range(dim)
    ])


@pytest.mark.parametrize("dim", [2, 3])
def test_linear_matches_scipy(dim):
    rng = np.random.RandomState(0)
    shape = (13, 17) if dim == 2 else (9, 13, 11)
    src = rng.randn(*shape).astype(np.float32)
    coords = _coords(rng, dim, shape)
    # include exact-integer and half coordinates (rounding edges)
    coords[:, :50] = np.round(coords[:, :50])
    coords[:, 50:100] = np.floor(coords[:, 50:100]) + 0.5

    ref = ndimage.map_coordinates(src.astype(np.float64), coords, order=1,
                                  mode="constant", cval=0.7)
    out = native.map_coordinates_linear(src, coords, cval=0.7)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dim", [2, 3])
def test_nearest_matches_scipy(dim):
    rng = np.random.RandomState(1)
    shape = (13, 17) if dim == 2 else (9, 13, 11)
    src = rng.randint(0, 7, size=shape).astype(np.uint8)
    coords = _coords(rng, dim, shape)
    coords[:, :50] = np.round(coords[:, :50])
    coords[:, 50:100] = np.floor(coords[:, 50:100]) + 0.5  # half-way ties

    ref = ndimage.map_coordinates(src, coords, order=0, mode="constant", cval=0)
    out = native.map_coordinates_nearest(src, coords, cval=0)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("dim,sigma", [(2, 3.0), (3, 1.5), (3, 11.0)])
def test_gaussian_matches_scipy(dim, sigma):
    rng = np.random.RandomState(2)
    shape = (40, 36) if dim == 2 else (20, 24, 18)
    arr = rng.uniform(-1, 1, size=shape)
    ref = ndimage.gaussian_filter(arr, sigma, mode="constant", cval=0)
    out = native.gaussian_filter_constant(arr, sigma)
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-12)


def test_augmentation_native_equals_scipy_path(monkeypatch):
    """The full spatial_augment_batch must give the same batches with and
    without the native library (same RNG draw sequence either way)."""
    from medicaldetectiontoolkit_tpu.data import augmentation as aug

    rng_data = np.random.RandomState(3)
    data = rng_data.randn(2, 1, 24, 24, 12).astype(np.float32)
    seg = (rng_data.rand(2, 1, 24, 24, 12) > 0.8).astype(np.uint8)
    da = dict(do_elastic_deform=True, alpha=(0., 200.), sigma=(9., 11.),
              do_rotation=True, angle_x=(0., 0.4), angle_y=(0., 0.1), angle_z=(0., 0.1),
              do_scale=True, scale=(0.9, 1.1), order_data=1, border_cval_data=0)

    d1, s1 = aug.spatial_augment_batch(data.copy(), seg.copy(), (16, 16, 8), da,
                                       np.random.RandomState(11))
    monkeypatch.setenv("MDT_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    d2, s2 = aug.spatial_augment_batch(data.copy(), seg.copy(), (16, 16, 8), da,
                                       np.random.RandomState(11))
    monkeypatch.setattr(native, "_tried", False)  # restore auto-detect

    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(s1, s2)


def test_openmp_multithreaded_paths_match_single_thread():
    """Force OMP_NUM_THREADS=4 on this (1-core) box and pin that every
    parallel code path produces output identical to the 1-thread run —
    the OpenMP decomposition must not change results (static schedule,
    per-line accumulation). Thread count is read at library load, so each
    configuration runs in its own subprocess."""
    import json
    import subprocess
    import sys

    code = """
import json, numpy as np
from medicaldetectiontoolkit_tpu import native
lib = native.get_lib()
if lib is None:
    print(json.dumps({"skip": True}))
    raise SystemExit(0)
rng = np.random.RandomState(5)
src = rng.randn(19, 17, 13).astype(np.float32)
seg = rng.randint(0, 9, size=(19, 17, 13)).astype(np.uint8)
coords = np.stack([rng.uniform(-2.0, 20.0, size=5000) for _ in range(3)])
lin = native.map_coordinates_linear(src, coords, cval=0.3)
near = native.map_coordinates_nearest(seg, coords, cval=0)
gauss = native.gaussian_filter_constant(src.astype(np.float64), 2.5)
print(json.dumps({
    "skip": False,
    "threads": lib.native_num_threads(),
    "lin": lin.tolist(), "near": near.tolist(), "gauss": gauss.ravel().tolist(),
}))
"""
    outs = {}
    for n in ("1", "4"):
        env = dict(os.environ)
        env["OMP_NUM_THREADS"] = n
        res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, env=env, timeout=300)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[n] = json.loads(res.stdout.splitlines()[-1])
    if outs["1"]["skip"] or outs["4"]["skip"]:
        pytest.skip("native library unavailable; scipy fallback in use")
    assert outs["4"]["threads"] == 4  # OMP honors the forced count
    np.testing.assert_array_equal(np.array(outs["1"]["lin"]), np.array(outs["4"]["lin"]))
    np.testing.assert_array_equal(np.array(outs["1"]["near"]), np.array(outs["4"]["near"]))
    np.testing.assert_array_equal(np.array(outs["1"]["gauss"]), np.array(outs["4"]["gauss"]))
