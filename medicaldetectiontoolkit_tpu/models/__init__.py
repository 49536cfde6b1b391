"""Model zoo: shared FPN backbone + detector families.

Mirrors the reference's ``models/`` (mrcnn, ufrcnn, retina_net, retina_unet,
detection_unet over one FPN, dynamically imported by path,
``utils/exp_utils.py:121-131``) with a registry keyed by ``cf.model`` instead
of path-based imports.
"""

from __future__ import annotations

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def _load_snapshot_sources(cf):
    """Import the exp-dir model/backbone snapshots so the registry points at
    the FROZEN code (reference tmp_model/tmp_backbone mechanism,
    ``utils/exp_utils.py:121-131``). The backbone snapshot is installed under
    the canonical module name first so the model snapshot's imports resolve
    to it."""
    import importlib.util
    import os
    import sys

    def load_registered(name, path):
        # register in sys.modules BEFORE exec: flax dataclass transforms
        # resolve cls.__module__ through sys.modules at class-creation time
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    bb_name = "medicaldetectiontoolkit_tpu.models.backbone"
    saved = {n: sys.modules.get(n) for n in (bb_name,)}
    try:
        bb_src = getattr(cf, "backbone_source_path", None)
        if bb_src and os.path.isfile(bb_src):
            load_registered(bb_name, bb_src)
        load_registered("medicaldetectiontoolkit_tpu.models._snapshot_model", cf.model_source_path)
    finally:
        # restore the canonical modules: the snapshot model keeps direct
        # references to the frozen backbone objects it imported, but later
        # non-snapshot imports in this process must NOT silently resolve to
        # the frozen code
        for n, mod in saved.items():
            if mod is not None:
                sys.modules[n] = mod
            else:
                sys.modules.pop(n, None)


def build_model(cf, logger):
    """Instantiate the detector named by ``cf.model``.

    When ``cf.model_source_path`` points at an experiment-dir snapshot
    (set by ``prep_exp`` under --use_stored_settings and at test time), that
    snapshot is imported and wins the registry entry — the run reproduces
    the frozen sources, not the installed ones.
    """
    import os

    if getattr(cf, "model_source_path", None) and os.path.isfile(cf.model_source_path):
        _load_snapshot_sources(cf)
    else:
        # import for side-effect registration
        from medicaldetectiontoolkit_tpu.models import retina_net, mrcnn, ufrcnn, detection_unet  # noqa: F401

    if cf.model not in _REGISTRY:
        raise KeyError(f"unknown model '{cf.model}', have {sorted(_REGISTRY)}")
    return _REGISTRY[cf.model](cf, logger)
