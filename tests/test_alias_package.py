"""The long-name alias package mirrors the full ``tvi`` tree with shared
module identity (timelapse_video_interpolation_tpu/__init__.py)."""

import sys


def test_alias_top_level():
    import timelapse_video_interpolation_tpu as pkg
    import tvi

    assert pkg.__version__ == tvi.__version__


def test_alias_subpackage_attribute_access():
    import timelapse_video_interpolation_tpu as pkg
    import tvi.models

    assert pkg.models is tvi.models


def test_alias_nested_import_shares_identity():
    import timelapse_video_interpolation_tpu.pipelines.interp as alias_interp
    import tvi.pipelines.interp as real_interp

    assert alias_interp is real_interp
    # the canonical name is preserved (jit caches, pickling, repr)
    assert alias_interp.__name__ == "tvi.pipelines.interp"
    assert sys.modules[
        "timelapse_video_interpolation_tpu.pipelines.interp"] is real_interp


def test_alias_from_import():
    from timelapse_video_interpolation_tpu.core.config import UNetConfig
    from tvi.core.config import UNetConfig as RealUNetConfig

    assert UNetConfig is RealUNetConfig
