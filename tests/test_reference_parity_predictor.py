"""Exact parity vs. the reference's WBC, nms_2to3D and COCO-AP (host NumPy).

The reference predictor/evaluator import torch (cpu available in this image),
so the actual consolidation and AP functions can be compared on random
inputs. Skipped when /root/reference is absent.
"""

import importlib.util
import os
import sys

import numpy as np
import pandas as pd
import pytest

REF_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference not mounted")


def _import_ref(name, rel):
    if REF_DIR not in sys.path:
        # APPEND, not insert(0): the reference root also contains an
        # `experiments` package — putting it first shadows the repo's own
        # `experiments.*` imports for every later test in the process
        sys.path.append(REF_DIR)
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF_DIR, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_predictor():
    return _import_ref("ref_predictor", "predictor.py")


@pytest.fixture(scope="module")
def ref_evaluator():
    return _import_ref("ref_evaluator", "evaluator.py")


from medicaldetectiontoolkit_tpu import predictor as our_predictor  # noqa: E402
from medicaldetectiontoolkit_tpu import evaluator as our_evaluator  # noqa: E402


def _random_dets(rng, n, dim):
    lo = rng.rand(n, dim) * 100
    hi = lo + rng.rand(n, dim) * 50 + 1
    if dim == 2:
        coords = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], 1)
    else:
        coords = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], 1)
    scores = rng.rand(n)
    pc = rng.rand(n) * 0.5 + 0.5
    novs = rng.randint(1, 4, n).astype(float)
    return np.concatenate([coords, scores[:, None], pc[:, None], novs[:, None]], axis=1)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("trial", range(3))
def test_weighted_box_clustering_parity(ref_predictor, dim, trial):
    rng = np.random.RandomState(trial)
    dets = _random_dets(rng, 40, dim)
    patch_ids = np.array([f"{rng.randint(3)}_{rng.randint(4)}_{rng.randint(5)}" for _ in range(40)])
    for thresh, n_ens in [(1e-5, 4), (0.3, 2), (0.7, 1)]:
        ts, tc = ref_predictor.weighted_box_clustering(dets.copy(), patch_ids.copy(), thresh, n_ens)
        os_, oc = our_predictor.weighted_box_clustering(dets.copy(), patch_ids.copy(), thresh, n_ens)
        np.testing.assert_allclose(os_, ts, rtol=1e-10)
        np.testing.assert_allclose(oc, tc, rtol=1e-10)


@pytest.mark.parametrize("trial", range(3))
def test_nms_2to3d_parity(ref_predictor, trial):
    rng = np.random.RandomState(10 + trial)
    n = 60
    lo = rng.rand(n, 2) * 80
    hi = lo + rng.rand(n, 2) * 40 + 1
    coords = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], 1)
    scores = rng.rand(n)
    slices = rng.randint(0, 12, n).astype(float)
    dets = np.concatenate([coords, scores[:, None], slices[:, None]], axis=1)
    tk, tz = ref_predictor.nms_2to3D(dets.copy(), 0.1)
    ok, oz = our_predictor.nms_2to3D(dets.copy(), 0.1)
    np.testing.assert_array_equal(ok, tk)
    np.testing.assert_allclose(oz, tz)


@pytest.mark.parametrize("trial", range(3))
def test_roi_ap_parity(ref_evaluator, trial):
    rng = np.random.RandomState(20 + trial)
    n = 200
    df = pd.DataFrame(
        {
            "class_label": rng.randint(0, 2, n),
            "pred_score": rng.rand(n),
            "det_type": rng.choice(["det_tp", "det_fp", "det_fn"], n),
            "match_iou": 0.1,
            "pid": rng.choice(["a", "b", "c"], n),
        }
    )
    # reference convention: fn rows carry label 1, score 0
    df.loc[df.det_type == "det_fn", "class_label"] = 1
    df.loc[df.det_type == "det_fn", "pred_score"] = 0.0
    df.loc[df.det_type == "det_tp", "class_label"] = 1
    df.loc[df.det_type == "det_fp", "class_label"] = 0
    for per_patient in (False, True):
        theirs = ref_evaluator.get_roi_ap_from_df([df.copy(), 0.1, per_patient])
        ours = our_evaluator.get_roi_ap_from_df([df.copy(), 0.1, per_patient])
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


class _Cf:
    def __init__(self):
        self.ap_match_ious = [0.1, 0.5]
        self.class_dict = {1: "a", 2: "b"}
        self.fold = 0


class _Log:
    def info(self, *a, **k):
        pass


def _random_boxes_list(rng, n_elements, dim=2):
    out = []
    for _ in range(n_elements):
        boxes = []
        for _ in range(rng.randint(0, 8)):
            lo = rng.rand(dim) * 100
            hi = lo + rng.rand(dim) * 40 + 1
            coords = np.concatenate([lo[:2], hi[:2]] + ([lo[2:], hi[2:]] if dim == 3 else []))
            if rng.rand() < 0.4:
                boxes.append({"box_type": "gt", "box_label": rng.randint(1, 3), "box_coords": coords})
            else:
                boxes.append(
                    {
                        "box_type": "det",
                        "box_pred_class_id": rng.randint(1, 3),
                        "box_score": float(rng.rand()),
                        "box_coords": coords,
                    }
                )
        out.append(boxes)
    return out


@pytest.mark.parametrize("trial", range(3))
def test_evaluate_predictions_matching_parity(ref_evaluator, trial):
    """Full evaluate_predictions df equality on random det/gt lists —
    pins the tp/fp/fn matching core independently of implementation."""
    rng = np.random.RandomState(40 + trial)
    results_list = [
        [_random_boxes_list(rng, 1), [f"pid{p}"]] for p in range(6)
    ]
    cf = _Cf()
    theirs = ref_evaluator.Evaluator(cf, _Log(), mode="val_patient")
    theirs.evaluate_predictions([[r[0], r[1][0]] for r in results_list])
    ours = our_evaluator.Evaluator(cf, _Log(), mode="val_patient")
    ours.evaluate_predictions([[r[0], r[1][0]] for r in results_list])
    tdf = theirs.test_df.reset_index(drop=True)
    odf = ours.test_df.reset_index(drop=True)
    for col in ["pred_score", "class_label", "pred_class", "pid", "det_type", "match_iou"]:
        np.testing.assert_array_equal(np.asarray(odf[col]), np.asarray(tdf[col]), err_msg=col)


def test_mirrored_patch_crops_parity(ref_predictor):
    crops = [[0, 128, 0, 128], [64, 192, 32, 160], [0, 128, 0, 128, 5, 37]]
    crops2d = [c for c in crops if len(c) == 4]
    shape = (1, 1, 256, 256, 64)
    theirs = ref_predictor.get_mirrored_patch_crops(crops, shape)
    ours = our_predictor.get_mirrored_patch_crops(crops, shape)
    assert ours == theirs
    del crops2d
