"""Data layer tests: seg->boxes, augmentation, fold gen, patch grid, toy pipeline."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from medicaldetectiontoolkit_tpu.data import dataloader_utils as dutils
from medicaldetectiontoolkit_tpu.data.augmentation import center_crop, mirror_batch, spatial_augment_batch
from medicaldetectiontoolkit_tpu.data.seg_to_boxes import convert_seg_to_bounding_box_coordinates


class TestSegToBoxes:
    def test_single_instance_2d(self):
        seg = np.zeros((1, 1, 32, 32), np.uint8)
        seg[0, 0, 10:20, 5:15] = 1
        batch = {"seg": seg, "class_target": [[1]]}
        out = convert_seg_to_bounding_box_coordinates(batch, dim=2)
        # min-1 / max+1 halo convention
        np.testing.assert_array_equal(out["bb_target"][0][0], [9, 4, 20, 15])
        assert out["roi_labels"][0][0] == 2  # class_target + 1
        assert out["seg"].max() == 1  # binarized

    def test_two_instances_and_class_specific_seg(self):
        seg = np.zeros((1, 1, 32, 32), np.uint8)
        seg[0, 0, 2:6, 2:6] = 1
        seg[0, 0, 20:28, 20:28] = 2
        batch = {"seg": seg, "class_target": [[0, 1]]}
        out = convert_seg_to_bounding_box_coordinates(batch, dim=2, class_specific_seg_flag=True)
        assert len(out["bb_target"][0]) == 2
        np.testing.assert_array_equal(out["roi_labels"][0], [1, 2])
        assert set(np.unique(out["seg"])) == {0, 1, 2}

    def test_empty_seg(self):
        batch = {"seg": np.zeros((1, 1, 16, 16), np.uint8), "class_target": [[1]]}
        out = convert_seg_to_bounding_box_coordinates(batch, dim=2)
        assert len(out["bb_target"][0]) == 0
        np.testing.assert_array_equal(out["roi_labels"][0], [-1])

    def test_3d_boxes(self):
        seg = np.zeros((1, 1, 16, 16, 8), np.uint8)
        seg[0, 0, 4:8, 6:10, 2:5] = 1
        batch = {"seg": seg, "class_target": [[0]]}
        out = convert_seg_to_bounding_box_coordinates(batch, dim=3)
        np.testing.assert_array_equal(out["bb_target"][0][0], [3, 5, 8, 10, 1, 5])

    def test_rois_from_seg_flag(self):
        seg = np.zeros((1, 1, 32, 32), np.uint8)
        seg[0, 0, 2:6, 2:6] = 1
        seg[0, 0, 20:28, 20:28] = 1  # disconnected, same label
        batch = {"seg": seg, "class_target": [1]}
        out = convert_seg_to_bounding_box_coordinates(batch, dim=2, get_rois_from_seg_flag=True)
        assert len(out["bb_target"][0]) == 2


class TestAugmentation:
    def test_mirror_preserves_content(self, rng):
        data = rng.rand(2, 1, 16, 16).astype(np.float32)
        seg = (data > 0.5).astype(np.uint8)
        d2, s2 = mirror_batch(data.copy(), seg.copy(), np.random.RandomState(3))
        assert sorted(d2.ravel()) == sorted(data.ravel())

    def test_center_crop_even(self):
        arr = np.arange(2 * 8 * 8).reshape(2, 8, 8)
        out = center_crop(arr, (4, 4))
        assert out.shape == (2, 4, 4)
        np.testing.assert_array_equal(out[0], arr[0, 2:6, 2:6])

    def test_center_crop_pads_small(self):
        arr = np.ones((1, 4, 4))
        out = center_crop(arr, (8, 8))
        assert out.shape == (1, 8, 8)
        assert out.sum() == 16

    def test_spatial_identity_when_disabled(self, rng):
        data = rng.rand(1, 1, 32, 32).astype(np.float32)
        seg = (data > 0.7).astype(np.uint8)
        kwargs = {"do_elastic_deform": False, "do_rotation": False, "do_scale": False, "order_data": 1}
        d2, s2 = spatial_augment_batch(data, seg, (32, 32), kwargs, np.random.RandomState(0))
        np.testing.assert_allclose(d2, data, atol=1e-5)
        np.testing.assert_array_equal(s2, seg)

    def test_spatial_augment_shapes_and_mass(self, rng):
        data = rng.rand(2, 1, 48, 48).astype(np.float32)
        seg = np.zeros((2, 1, 48, 48), np.uint8)
        seg[:, :, 20:28, 20:28] = 1
        kwargs = {
            "do_elastic_deform": True,
            "alpha": (0.0, 300.0),
            "sigma": (30.0, 50.0),
            "do_rotation": True,
            "angle_x": (0.0, 2 * np.pi),
            "angle_y": (0.0, 0),
            "angle_z": (0.0, 0),
            "do_scale": True,
            "scale": (0.8, 1.1),
            "order_data": 1,
        }
        d2, s2 = spatial_augment_batch(data, seg, (32, 32), kwargs, np.random.RandomState(5))
        assert d2.shape == (2, 1, 32, 32)
        assert s2.shape == (2, 1, 32, 32)
        assert s2.sum() > 0  # centered object survives


class TestFoldGenerator:
    def test_partition_properties(self):
        fg = dutils.fold_generator(seed=0, n_splits=5, len_data=100)
        folds = fg.get_fold_names()
        assert len(folds) == 5
        all_test = np.concatenate([f[2] for f in folds])
        # every element appears exactly once as test across folds
        assert sorted(all_test.tolist()) == list(range(100))
        for tr, val, te, fold in folds:
            assert len(set(tr) & set(val)) == 0
            assert len(set(tr) & set(te)) == 0
            assert len(set(val) & set(te)) == 0
            assert len(tr) + len(val) + len(te) == 100

    def test_uneven_split(self):
        fg = dutils.fold_generator(seed=1, n_splits=5, len_data=103)
        folds = fg.get_fold_names()
        all_test = np.concatenate([f[2] for f in folds])
        assert sorted(all_test.tolist()) == list(range(103))

    def test_deterministic(self):
        a = dutils.fold_generator(0, 5, 50).get_fold_names()
        b = dutils.fold_generator(0, 5, 50).get_fold_names()
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa[0], fb[0])


class TestPatchGrid:
    def test_single_patch(self):
        img = np.zeros((100, 100))
        coords = dutils.get_patch_crop_coords(img, [128, 128])
        np.testing.assert_array_equal(coords, [[0, 100, 0, 100]])

    def test_overlap_enforced(self):
        img = np.zeros((300, 300))
        coords = dutils.get_patch_crop_coords(img, [128, 128], min_overlap=30)
        assert len(coords) >= 9
        for c in coords:
            assert c[1] - c[0] == 128 and c[3] - c[2] == 128
        # full coverage
        cover = np.zeros((300, 300))
        for y1, y2, x1, x2 in coords:
            cover[max(y1, 0) : y2, max(x1, 0) : x2] = 1
        assert cover.all()

    def test_z_slicewise(self):
        img = np.zeros((100, 100, 10))
        coords = dutils.get_patch_crop_coords(img, [128, 128, 1])
        assert len(coords) == 10
        assert all(c[5] - c[4] == 1 for c in coords)


class TestPadNdImage:
    def test_pad_and_slicer_roundtrip(self, rng):
        img = rng.rand(1, 1, 37, 52)
        padded, slicer = dutils.pad_nd_image(img, new_shape=(64, 64), return_slicer=True)
        assert padded.shape == (1, 1, 64, 64)
        np.testing.assert_array_equal(padded[tuple(slicer)], img)

    def test_divisibility(self):
        img = np.zeros((1, 3, 37, 52))
        padded = dutils.pad_nd_image(img, shape_must_be_divisible_by=(32, 32))
        assert padded.shape[-2] % 32 == 0 and padded.shape[-1] % 32 == 0

    def test_no_crop_when_larger(self):
        img = np.zeros((5, 80, 90))
        padded = dutils.pad_nd_image(img, new_shape=(64, 64))
        assert padded.shape == (5, 80, 90)


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("toy")
    # import by explicit file path: the package import `experiments.*` is
    # order-dependent — parity tests that sys.path the mounted reference
    # first would shadow it with the REFERENCE's generate_toys (different
    # signature), an ordering flake hit when running test subsets
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_repo_generate_toys", "/root/repo/experiments/toy_exp/generate_toys.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    mod.generate_experiment(str(root), "donuts_shape", n_train_images=24, n_test_images=6, mode="donuts_shape")
    return str(root)


class TestToyPipeline:
    def _cf(self, toy_dataset):
        os.environ["MDT_TOY_ROOT"] = toy_dataset
        os.environ["MDT_MODEL"] = "retina_net"
        import importlib
        import experiments.toy_exp.configs as cfg_mod

        importlib.reload(cfg_mod)
        cf = cfg_mod.configs()
        cf.n_train_val_data = 24
        cf.batch_size = 4
        cf.n_workers = 2
        cf.server_env = False
        return cf

    def test_train_batch_contract(self, toy_dataset):
        from experiments.toy_exp import data_loader as dl

        class _Log:
            def info(self, *a):
                pass

        cf = self._cf(toy_dataset)
        gens = dl.get_train_generators(cf, _Log())
        batch = next(gens["train"])
        gens["train"].shutdown()
        gens["val_sampling"].shutdown()
        assert batch["data"].shape == (4, 1, 320, 320)
        assert batch["seg"].shape == (4, 1, 320, 320)
        assert len(batch["bb_target"]) == 4
        assert len(batch["roi_labels"]) == 4
        for bl, rl in zip(batch["bb_target"], batch["roi_labels"]):
            if len(bl):
                assert rl[0] in (1, 2)
                y1, x1, y2, x2 = bl[0]
                assert y2 > y1 and x2 > x1

    def test_patient_iterator(self, toy_dataset):
        from experiments.toy_exp import data_loader as dl

        class _Log:
            def info(self, *a):
                pass

        cf = self._cf(toy_dataset)
        gen = dl.get_test_generator(cf, _Log())
        assert gen["n_test"] == 6
        batch = next(gen["test"])
        assert batch["data"].shape == (1, 1, 320, 320)
        assert "patient_bb_target" in batch
        assert batch["original_img_shape"] == (1, 1, 320, 320)
