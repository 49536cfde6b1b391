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


def build_model(cf, logger):
    """Instantiate the detector named by ``cf.model``."""
    # import for side-effect registration
    from medicaldetectiontoolkit_tpu.models import retina_net, mrcnn, ufrcnn, detection_unet  # noqa: F401

    if cf.model not in _REGISTRY:
        raise KeyError(f"unknown model '{cf.model}', have {sorted(_REGISTRY)}")
    return _REGISTRY[cf.model](cf, logger)
