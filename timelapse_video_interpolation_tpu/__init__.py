"""Alias package: ``timelapse_video_interpolation_tpu`` re-exports ``tvi``.

The framework's canonical package name is the short ``tvi`` (SURVEY §7.1);
this alias provides the long explicit name for discoverability, and mirrors
the full subpackage tree so both spellings work interchangeably:

    import timelapse_video_interpolation_tpu as tvi_long
    from timelapse_video_interpolation_tpu.models.unet_st import (
        UNetSpatioTemporalConditionModel,
    )
    from timelapse_video_interpolation_tpu.pipelines.interp import (
        EfficientInterpPipeline,
    )

Every ``timelapse_video_interpolation_tpu.X[.Y]`` module IS the
corresponding ``tvi.X[.Y]`` module object (same identity, not a copy), so
isinstance checks, module-level state, and jit caches are shared.
"""

import importlib as _importlib
import importlib.abc  # noqa: F401  (for _importlib.abc below)
import importlib.util  # noqa: F401
import sys as _sys

import tvi as _tvi
from tvi import *  # noqa: F401,F403

__version__ = _tvi.__version__

_SUBPACKAGES = (
    "apps", "control", "core", "data", "diffusion", "io", "models", "ops",
    "parallel", "pipelines", "train", "utils",
)


def __getattr__(name: str):
    """Lazy subpackage access: ``timelapse_video_interpolation_tpu.models``
    imports and returns ``tvi.models`` (PEP 562)."""
    if name in _SUBPACKAGES:
        mod = _importlib.import_module(f"tvi.{name}")
        _sys.modules[f"{__name__}.{name}"] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


class _AliasLoader(_importlib.abc.Loader):
    """Returns the already-imported ``tvi.*`` module object itself;
    module_from_spec leaves existing __name__/__spec__ untouched
    (override=False), so identity AND the canonical name are preserved."""

    def __init__(self, target: str):
        self._target = target

    def create_module(self, spec):  # noqa: ARG002
        return _importlib.import_module(self._target)

    def exec_module(self, module):  # already executed under its real name
        pass


class _AliasFinder(_importlib.abc.MetaPathFinder):
    """Import-system hook so ``import timelapse_video_interpolation_tpu.a.b``
    resolves to ``tvi.a.b`` without materializing alias modules on disk."""

    _PREFIX = __name__ + "."

    def find_spec(self, fullname, path=None, target=None):  # noqa: ARG002
        if not fullname.startswith(self._PREFIX):
            return None
        alias_target = "tvi." + fullname[len(self._PREFIX):]
        return _importlib.util.spec_from_loader(
            fullname, _AliasLoader(alias_target))


# must precede the builtin PathFinder: shared subpackages carry tvi's
# __path__, so PathFinder would otherwise load fresh duplicate modules
# under the alias names
_sys.meta_path.insert(0, _AliasFinder())
