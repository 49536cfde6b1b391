"""WBC + 2D->3D merging consolidation tests (host NumPy path)."""

import numpy as np

from medicaldetectiontoolkit_tpu.predictor import (
    apply_wbc_to_patient,
    get_mirrored_patch_crops,
    merge_2D_to_3D_preds_per_patient,
    nms_2to3D,
    weighted_box_clustering,
)


def make_det(coords, score, cl=1, patch_id="0_0", pcf=1.0, novs=1.0):
    return {
        "box_coords": np.array(coords, dtype=float),
        "box_score": score,
        "box_type": "det",
        "box_pred_class_id": cl,
        "patch_id": patch_id,
        "box_patch_center_factor": pcf,
        "box_n_overlaps": novs,
    }


class TestWBC:
    def test_single_full_confidence_box_passes_through(self):
        # one patch covering the image, n_ens=1: WBC reduces to identity
        dets = np.array([[10, 10, 30, 30, 0.9, 1.0, 1.0]])
        scores, coords = weighted_box_clustering(dets, np.array(["0_0"]), thresh=1e-5, n_ens=1)
        assert len(scores) == 1
        np.testing.assert_allclose(scores[0], 0.9, atol=1e-6)
        np.testing.assert_allclose(coords[0], [10, 10, 30, 30], atol=1e-6)

    def test_cluster_averages_coordinates(self):
        dets = np.array(
            [[10, 10, 30, 30, 0.8, 1.0, 1.0], [12, 12, 32, 32, 0.8, 1.0, 1.0]]
        )
        scores, coords = weighted_box_clustering(dets, np.array(["0_0", "0_1"]), thresh=0.1, n_ens=2)
        assert len(scores) == 1
        assert 10 < coords[0][0] < 12  # averaged y1

    def test_missing_predictions_downweight_score(self):
        # 1 prediction but 4 expected (n_ens=4) -> score ~ 0.9/4
        dets = np.array([[10, 10, 30, 30, 0.9, 1.0, 1.0]])
        scores, _ = weighted_box_clustering(dets, np.array(["0_0"]), thresh=1e-5, n_ens=4)
        np.testing.assert_allclose(scores[0], 0.9 / 4, atol=1e-6)

    def test_low_score_cluster_dropped(self):
        dets = np.array([[10, 10, 30, 30, 0.03, 1.0, 1.0]])
        scores, _ = weighted_box_clustering(dets, np.array(["0_0"]), thresh=1e-5, n_ens=4)
        assert len(scores) == 0

    def test_3d_boxes(self):
        dets = np.array([[10, 10, 30, 30, 2, 8, 0.9, 1.0, 1.0]])
        scores, coords = weighted_box_clustering(dets, np.array(["0_0"]), thresh=1e-5, n_ens=1)
        assert len(coords[0]) == 6

    def test_apply_wbc_to_patient_keeps_gt(self):
        b = [
            make_det([10, 10, 30, 30], 0.9),
            {"box_coords": np.array([1, 1, 5, 5]), "box_label": 1, "box_type": "gt"},
        ]
        out, pid = apply_wbc_to_patient([[b], "pidX", {1: "a", 2: "b"}, 1e-5, 1])
        assert pid == "pidX"
        types = [x["box_type"] for x in out[0]]
        assert "gt" in types and "det" in types


class TestNms2to3D:
    def test_contiguous_slices_merge(self):
        # same box on slices 3,4,5 -> one cube z1=2, z2=6
        dets = np.array(
            [
                [10, 10, 30, 30, 0.9, 4],
                [10, 10, 30, 30, 0.8, 3],
                [10, 10, 30, 30, 0.7, 5],
            ]
        )
        keep, keep_z = nms_2to3D(dets, thresh=0.1)
        assert len(keep) == 1
        assert keep_z[0] == [2, 6]

    def test_hole_splits_cubes(self):
        # slices 3,4 then 7 (hole at 5,6): core at 4 -> cube [2,5]; 7 separate
        dets = np.array(
            [
                [10, 10, 30, 30, 0.9, 4],
                [10, 10, 30, 30, 0.8, 3],
                [10, 10, 30, 30, 0.7, 7],
            ]
        )
        keep, keep_z = nms_2to3D(dets, thresh=0.1)
        assert len(keep) == 2
        assert keep_z[0] == [2, 5]
        assert keep_z[1] == [6, 8]

    def test_disjoint_xy_boxes_stay_separate(self):
        dets = np.array(
            [
                [10, 10, 30, 30, 0.9, 4],
                [100, 100, 130, 130, 0.8, 4],
            ]
        )
        keep, keep_z = nms_2to3D(dets, thresh=0.1)
        assert len(keep) == 2

    def test_merge_wrapper(self):
        slices = [[] for _ in range(10)]
        for z in (3, 4, 5):
            slices[z].append(make_det([10, 10, 30, 30], 0.8))
        out, pid = merge_2D_to_3D_preds_per_patient([slices, "p", {1: "a"}, 0.1])
        assert len(out) == 1  # dummy batch dim
        dets3d = [b for b in out[0] if b["box_type"] == "det"]
        assert len(dets3d) == 1
        assert len(dets3d[0]["box_coords"]) == 6


class TestMirroredPatchCrops:
    def test_roundtrip_shapes(self):
        crops = [[0, 128, 0, 128], [64, 192, 0, 128]]
        shape = (1, 1, 256, 256)
        out = get_mirrored_patch_crops(crops, shape)
        assert len(out) == 3
        # y-mirror of [0,128] in a 256 image is [128, 256]
        assert out[0][0][:2] == [128, 256]
        # x-mirror keeps y
        assert out[1][0][:2] == [0, 128]
        assert out[1][0][2:] == [128, 256]

    def test_3d_crops_keep_z(self):
        crops = [[0, 128, 0, 128, 5, 37]]
        out = get_mirrored_patch_crops(crops, (1, 1, 256, 256, 64))
        for m in out:
            assert m[0][4:] == [5, 37]
