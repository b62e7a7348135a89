"""Alias package: ``timelapse_video_interpolation_tpu`` re-exports ``tvi``.

The framework's canonical package name is the short ``tvi`` (SURVEY §7.1);
this alias provides the long, explicit name for discoverability.
"""

import sys as _sys

import tvi as _tvi
from tvi import *  # noqa: F401,F403

_sys.modules.setdefault("timelapse_video_interpolation_tpu.core", _tvi.core)
__version__ = _tvi.__version__
