"""End-to-end synthetic-LIDC tests: patched patient inference through the
full Predictor pipeline (tiling -> TTA -> WBC -> 2D->3D merge) + training."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.predictor import Predictor
from medicaldetectiontoolkit_tpu.evaluator import Evaluator
from medicaldetectiontoolkit_tpu.testing import make_config


class _Log:
    def info(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def synth_lidc(tmp_path_factory):
    from experiments.lidc_exp.preprocessing import generate_synthetic_lidc

    out = str(tmp_path_factory.mktemp("synth_lidc"))
    generate_synthetic_lidc(out, n_patients=4, shape=(16, 48, 48))
    return out


def lidc_like_cf(dim, synth_dir, tmp_path, model="retina_net"):
    cf = make_config(model=model, dim=dim, patch_size=[32, 32] if dim == 2 else [32, 32, 8], batch_size=3)
    cf.pp_data_path = synth_dir
    cf.pp_test_data_path = synth_dir
    cf.input_df_name = "info_df.pickle"
    cf.exp_dir = str(tmp_path)
    cf.plot_dir = os.path.join(str(tmp_path), "plots")
    os.makedirs(cf.plot_dir, exist_ok=True)
    cf.fold_dir = os.path.join(str(tmp_path), "fold_0")
    os.makedirs(cf.fold_dir, exist_ok=True)
    cf.fold = 0
    cf.created_fold_id_pickle = False
    cf.hold_out_test_set = False
    cf.n_cv_splits = 4
    cf.n_workers = 2
    cf.select_prototype_subset = None
    cf.merge_2D_to_3D_preds = dim == 2
    cf.merge_3D_iou = 0.1
    cf.n_3D_context = None
    cf.pre_crop_size = [40, 40] if dim == 2 else [40, 40, 10]
    cf.patch_size_2D = [32, 32]
    cf.patch_size_3D = [32, 32, 8]
    cf.da_kwargs = {
        "do_elastic_deform": False,
        "do_rotation": True,
        "angle_x": (0.0, 2 * np.pi) if dim == 2 else (0, 0),
        "angle_y": (0, 0),
        "angle_z": (0, 0) if dim == 2 else (0.0, 2 * np.pi),
        "do_scale": True,
        "scale": (0.9, 1.1),
        "random_crop": False,
        "order_data": 1,
        "border_cval_data": 0,
    }
    cf.wcs_iou = 1e-5
    cf.test_aug = True
    cf.class_specific_seg_flag = False
    cf.max_test_patients = "all"
    cf.batch_sample_slack = 0.2
    cf.val_mode = "val_patient"
    cf.max_val_patients = 1
    cf.head_classes = 3
    cf.class_dict = {1: "benign", 2: "malignant"}
    cf.ap_match_ious = [0.1]
    cf.report_score_level = ["patient", "rois"]
    cf.patient_class_of_interest = 2
    cf.per_patient_ap = False
    cf.plot_prediction_histograms = False
    cf.plot_stat_curves = False
    cf.scan_det_thresh = False
    cf.model_selection_criteria = ["benign_ap", "malignant_ap"]
    return cf


@pytest.mark.slow
@pytest.mark.parametrize("dim", [2, 3])
def test_train_batches_and_patched_patient_prediction(synth_lidc, tmp_path, dim):
    from experiments.lidc_exp import data_loader as dl

    cf = lidc_like_cf(dim, synth_lidc, tmp_path)
    net = build_model(cf, _Log())
    net.initialize()

    gens = dl.get_train_generators(cf, _Log())
    batch = next(gens["train"])
    assert batch["data"].shape[0] == cf.batch_size
    assert batch["data"].shape[2:] == tuple(cf.patch_size)
    res = net.train_forward(batch)
    assert np.isfinite(res["loss"])
    gens["train"].shutdown()
    gens["val_sampling"].shutdown()

    # patched patient prediction in val mode (tiling + consolidation)
    val_predictor = Predictor(cf, net, _Log(), mode="val")
    patient = next(gens["val_patient"])
    assert "patch_crop_coords" in patient  # 48 > 32 forces tiling
    results = val_predictor.predict_patient(patient)
    n_elements = 1 if (dim == 3 or cf.merge_2D_to_3D_preds) else patient["original_img_shape"][0]
    assert len(results["boxes"]) == n_elements
    types = {b["box_type"] for bl in results["boxes"] for b in bl}
    assert "gt" in types
    # all det boxes must have consolidated (WBC) structure
    want_coords = 6 if (cf.merge_2D_to_3D_preds or dim == 3) else 4
    for bl in results["boxes"]:
        for b in bl:
            if b["box_type"] == "det":
                assert len(b["box_coords"]) == want_coords

    # evaluation over the patient works end to end
    ev = Evaluator(cf, _Log(), mode="val_patient")
    ev.evaluate_predictions([[results["boxes"], patient["pid"]]])
    assert ev.test_df is not None and len(ev.test_df) > 0

    # mirror-TTA forward (test mode): all 4 aug variants contribute boxes
    # with un-mirrored coords inside the original image bounds
    tta_predictor = Predictor(cf, net, _Log(), mode="val")
    tta_predictor.mode = "test"  # skip checkpoint-ranking setup, keep TTA path
    tta_results = tta_predictor.data_aug_forward(patient)
    shape = patient["original_img_shape"]
    aug_ids = set()
    for bl in tta_results["boxes"]:
        for b in bl:
            if b["box_type"] != "det":
                continue
            aug_ids.add(b["patch_id"].split("_")[1])
            c = b["box_coords"]
            assert c[2] >= c[0] and c[3] >= c[1]
            assert c[0] >= -1e-6 and c[1] >= -1e-6
            assert c[2] <= shape[2] + 1e-6 and c[3] <= shape[3] + 1e-6
    if aug_ids:  # random tiny model may detect nothing; when it does, all 4 variants must appear
        assert aug_ids == {"0", "1", "2", "3"}, aug_ids
    gens["val_patient"].shutdown() if hasattr(gens["val_patient"], "shutdown") else None


def test_n_3d_context_slices_in_channels(synth_lidc, tmp_path):
    """2D loader with n_3D_context=1: train batches and patient/patch batches
    carry each slice's z neighbors stacked into channels (3 channels here)."""
    from experiments.lidc_exp import data_loader as dl

    cf = lidc_like_cf(2, synth_lidc, tmp_path)
    cf.n_3D_context = 1
    cf.n_channels = 3  # (2*ctx+1) * 1 input channel
    cf.merge_2D_to_3D_preds = False

    gens = dl.get_train_generators(cf, _Log())
    batch = next(gens["train"])
    assert batch["data"].shape == (cf.batch_size, 3, *cf.patch_size)
    gens["train"].shutdown()
    gens["val_sampling"].shutdown()

    patient = next(gens["val_patient"])
    # synthetic patients are 48x48x16 -> patched (patch 32x32), z slice-wise
    assert "patch_crop_coords" in patient
    assert patient["data"].shape[1] == 3
    assert patient["data"].shape[2:] == tuple(cf.patch_size)
    # a patch at z-slice s must contain slices (s-1, s, s+1) of the volume
    crops = patient["patch_crop_coords"]
    vol = np.load(os.path.join(synth_lidc, f"{patient['pid']}_img.npy"))  # (z, y, x)
    vol = np.transpose(vol, (1, 2, 0))  # (y, x, z)
    mid = len(crops) // 2
    c = crops[mid]
    z = c[4]
    want_center = vol[c[0] : c[1], c[2] : c[3], z]
    np.testing.assert_allclose(patient["data"][mid, 1], want_center, rtol=1e-6)
    if z > 0:
        np.testing.assert_allclose(patient["data"][mid, 0], vol[c[0] : c[1], c[2] : c[3], z - 1], rtol=1e-6)
