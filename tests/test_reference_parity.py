"""Direct parity tests against the reference implementation (when mounted).

The reference's ``utils/dataloader_utils.py`` is importable without torch, so
fold splits, patch grids and padding can be compared EXACTLY. Skipped when
/root/reference is absent (the framework is standalone).
"""

import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/utils/dataloader_utils.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_dutils():
    spec = importlib.util.spec_from_file_location("ref_dutils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


from medicaldetectiontoolkit_tpu.data import dataloader_utils as dutils  # noqa: E402


@pytest.mark.parametrize("seed,n_splits,len_data", [(0, 5, 100), (0, 5, 103), (7, 4, 37), (3, 5, 1000)])
def test_fold_generator_exact_parity(ref_dutils, seed, n_splits, len_data):
    ours = dutils.fold_generator(seed, n_splits, len_data).get_fold_names()
    theirs = ref_dutils.fold_generator(seed, n_splits, len_data).get_fold_names()
    for (otr, oval, ote, ofold), (ttr, tval, tte, tfold) in zip(ours, theirs):
        np.testing.assert_array_equal(otr, ttr)
        np.testing.assert_array_equal(oval, tval)
        np.testing.assert_array_equal(ote, tte)
        assert ofold == tfold


@pytest.mark.parametrize(
    "shape,patch,overlap",
    [((300, 300), [128, 128], 30), ((500, 400, 80), [128, 128, 64], 30), ((100, 100, 10), [128, 128, 1], 30),
     ((288, 288), [288, 288], 30), ((300, 300, 64), [128, 128, 64], 50)],
)
def test_patch_crop_coords_exact_parity(ref_dutils, shape, patch, overlap):
    img = np.zeros(shape)
    ours = dutils.get_patch_crop_coords(img, patch, min_overlap=overlap)
    theirs = ref_dutils.get_patch_crop_coords(img, patch, min_overlap=overlap)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize(
    "shape,new_shape,divisible",
    [((1, 1, 37, 52), (64, 64), None), ((5, 80, 90), (64, 64), None), ((1, 3, 37, 52), None, (32, 32)),
     ((2, 2, 100, 100, 31), (128, 128, 64), None)],
)
def test_pad_nd_image_exact_parity(ref_dutils, shape, new_shape, divisible):
    rng = np.random.RandomState(0)
    img = rng.rand(*shape)
    ours, oslicer = dutils.pad_nd_image(
        img, new_shape=new_shape, shape_must_be_divisible_by=divisible, return_slicer=True, mode="constant"
    )
    theirs, tslicer = ref_dutils.pad_nd_image(
        img, new_shape=new_shape, shape_must_be_divisible_by=divisible, return_slicer=True, mode="constant"
    )
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_array_equal(ours[tuple(oslicer)], theirs[tuple(tslicer)])


def test_class_balanced_sampling_statistical_parity(ref_dutils):
    """Same RNG stream -> identical picks (our impl takes an explicit rng but
    falls back to np.random like the reference)."""
    class_targets = [[0], [1], [0, 1], [1, 1], [0]] * 10
    np.random.seed(123)
    theirs = ref_dutils.get_class_balanced_patients(class_targets, 20, 2, slack_factor=0.2)
    np.random.seed(123)
    ours = dutils.get_class_balanced_patients(class_targets, 20, 2, slack_factor=0.2)
    assert list(ours) == list(theirs)
