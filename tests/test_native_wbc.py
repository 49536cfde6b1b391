"""Native C++ weighted box clustering == the NumPy greedy loop.

The NumPy path itself is parity-pinned against the mounted reference in
tests/test_reference_parity_predictor.py; this file pins native == NumPy
(same seeds order, membership, unique-patch-id downweighting) so the
native shortcut inherits that contract."""

import numpy as np
import pytest

from medicaldetectiontoolkit_tpu import native
from medicaldetectiontoolkit_tpu import predictor as pred


def _dets(rng, n, dim, img=320, patches=12):
    lo = rng.uniform(0, img - 40, (n, dim))
    ext = rng.uniform(8, 60, (n, dim))
    hi = np.minimum(lo + ext, img)
    cols = [lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]]
    if dim == 3:
        cols += [lo[:, 2], hi[:, 2]]
    coords = np.stack(cols, 1)
    dets = np.concatenate(
        [coords, rng.uniform(0.01, 1, (n, 1)), rng.uniform(0.3, 1, (n, 1)),
         rng.uniform(1, 4, (n, 1))], axis=1,
    )
    pids = np.array([f"p{rng.randint(patches)}" for _ in range(n)])
    return dets, pids


def _numpy_wbc(dets, pids, thresh, n_ens, monkeypatch):
    # force the NumPy loop by hiding the native library
    monkeypatch.setattr(native, "get_lib", lambda: None)
    return pred.weighted_box_clustering(dets, pids, thresh, n_ens)


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("dim,n,thresh", [(2, 200, 0.5), (3, 500, 0.3), (3, 37, 1e-5)])
def test_native_matches_numpy(dim, n, thresh, monkeypatch):
    rng = np.random.RandomState(dim * 100 + n)
    dets, pids = _dets(rng, n, dim)
    ns, nc = pred.weighted_box_clustering(dets, pids, thresh, 5)
    ws, wc = _numpy_wbc(dets, pids, thresh, 5, monkeypatch)
    assert len(ns) == len(ws)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(ws), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(nc), np.asarray(wc), rtol=1e-9)


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("n,thresh", [(300, 0.1), (1000, 0.35), (40, 1e-5)])
def test_native_nms_2to3d_matches_numpy(n, thresh, monkeypatch):
    rng = np.random.RandomState(n)
    coords = _dets(rng, n, 2)[0][:, :4]
    dets = np.concatenate(
        [coords, rng.uniform(0.01, 1, (n, 1)),
         rng.randint(0, 48, (n, 1)).astype(float)], axis=1,
    )
    nk, nz = pred.nms_2to3D(dets, thresh)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    wk, wz = pred.nms_2to3D(dets, thresh)
    assert list(nk) == list(wk)  # identical seeds, identical order
    np.testing.assert_array_equal(np.asarray(nz), np.asarray(wz))


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_small_sets_use_numpy_and_agree(monkeypatch):
    rng = np.random.RandomState(7)
    dets, pids = _dets(rng, 8, 2)  # below the native cutover
    s1, c1 = pred.weighted_box_clustering(dets, pids, 0.4, 3)
    s2, c2 = _numpy_wbc(dets, pids, 0.4, 3, monkeypatch)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-12)
