"""Async dispatch/convert pipeline equality for the non-retina families.

The trainer's one-step-deep pipeline (exec.py: dispatch step i+1 before
converting step i) must be result-identical to the serial loop for every
detector that implements the dispatch/convert split. retina_net is covered
in tests/test_retina_net.py; this file pins mrcnn (dense two-stage convert
path) and detection_unet (host connected-components convert path).
"""

import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.testing import make_batch, make_config


class _Log:
    def info(self, *a, **k):
        pass

    def __getattr__(self, name):
        return self.info


@pytest.mark.parametrize("model", ["mrcnn", "detection_unet"])
def test_pipelined_dispatch_matches_serial(model):
    cf = make_config(model=model, dim=2, batch_size=2, retina_scales=(model != "mrcnn"))
    batches = []
    for i in range(3):
        b = make_batch(cf, seed=42 + i)
        batches.append(b)

    def run(pipelined):
        import jax

        net = build_model(make_config(model=model, dim=2, batch_size=2,
                                      retina_scales=(model != "mrcnn")), _Log())
        net.initialize(seed=11)
        outs = []
        if pipelined:
            pending = None
            for b in batches:
                h = net.train_forward_dispatch(b)
                if pending is not None:
                    outs.append(net.train_forward_convert(*pending))
                pending = (h, b)
            outs.append(net.train_forward_convert(*pending))
        else:
            outs = [net.train_forward(b) for b in batches]
        return outs, jax.device_get(net.params)

    serial_outs, serial_params = run(False)
    pipe_outs, pipe_params = run(True)
    import jax

    for a, b in zip(serial_outs, pipe_outs):
        assert a["logger_string"] == b["logger_string"]
        assert len(a["boxes"]) == len(b["boxes"])
        np.testing.assert_array_equal(a["seg_preds"], b["seg_preds"])
    for pa, pb in zip(jax.tree_util.tree_leaves(serial_params), jax.tree_util.tree_leaves(pipe_params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
