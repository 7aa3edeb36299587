"""Import reference torch modules as parity-test oracles WITHOUT executing
package __init__ files (they pull unavailable deps like torchvision).

The reference at /root/reference is used read-only, purely as ground truth
for output parity. Skipped automatically when absent.
"""

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/model"


def _register_stub_package(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod
    return mod


def load_ref_module(dotted: str):
    """load_ref_module('segment_anything_med2d.modeling.image_encoder')."""
    if not os.path.isdir(REF_ROOT):
        import pytest
        pytest.skip("reference repo not available")
    parts = dotted.split(".")
    pkg_path = REF_ROOT
    for i, part in enumerate(parts[:-1]):
        pkg_path = os.path.join(pkg_path, part)
        _register_stub_package(".".join(parts[: i + 1]), pkg_path)
    full = dotted
    if full in sys.modules:
        return sys.modules[full]
    file_path = os.path.join(pkg_path, parts[-1] + ".py")
    spec = importlib.util.spec_from_file_location(full, file_path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = ".".join(parts[:-1])
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
