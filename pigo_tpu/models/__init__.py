import importlib

_EXPORTS = {
    "FaceCascade": "pigo_tpu.models.face",
    "PupilLocalizer": "pigo_tpu.models.pupil",
    "Puploc": "pigo_tpu.models.pupil",
    "LandmarkLocalizer": "pigo_tpu.models.landmark",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'pigo_tpu.models' has no attribute {name!r}")
    value = getattr(importlib.import_module(mod), name)
    globals()[name] = value
    return value
