"""Legacy DiffSynth extension zoo, rebuilt TPU-native (SURVEY M7 / §5.5).

Lazy exports: importing this package stays cheap; submodules load on first
attribute access (same pattern as the top-level package).
"""

_EXPORTS = {
    "esrgan": "physicedit_tpu.extensions.esrgan",
    "rife": "physicedit_tpu.extensions.rife",
    "tiler": "physicedit_tpu.extensions.tiler",
    "quality_metric": "physicedit_tpu.extensions.quality_metric",
    "fastblend": "physicedit_tpu.extensions.fastblend",
    "processors": "physicedit_tpu.extensions.processors",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        return importlib.import_module(_EXPORTS[name])
    raise AttributeError(name)
