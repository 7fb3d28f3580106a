"""Every module imports cleanly (catches latent symbol errors in modules the
functional tests touch lazily)."""

import importlib
import pkgutil

import pytest

import deepcut_tpu


def _all_modules():
    mods = []
    for m in pkgutil.walk_packages(deepcut_tpu.__path__, prefix="deepcut_tpu."):
        if m.name.endswith("librasterizer"):
            continue  # the C++ shared object, not a Python module
        mods.append(m.name)
    return mods


@pytest.mark.parametrize("name", _all_modules())
def test_module_imports(name):
    importlib.import_module(name)
