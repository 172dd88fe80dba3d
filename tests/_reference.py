"""Shared shim for importing the read-only reference implementation
(/root/reference) as a numerical test oracle.

The bare image lacks a few of the reference's auxiliary deps (yacs, lazy);
they are stubbed minimally — enough for module import, never exercised by the
oracles we call.
"""

import functools
import os
import sys
import types

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "gmpi"))


def install_stubs() -> None:
    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = dict
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "lazy" not in sys.modules:
        lazy_mod = types.ModuleType("lazy")

        def lazy(fn):  # cached-property lookalike
            attr = "_lazy_" + fn.__name__

            @property
            @functools.wraps(fn)
            def wrapper(self):
                if not hasattr(self, attr):
                    setattr(self, attr, fn(self))
                return getattr(self, attr)

            return wrapper

        lazy_mod.lazy = lazy
        sys.modules["lazy"] = lazy_mod
    for p in (REFERENCE, os.path.join(REFERENCE, "gmpi", "models")):
        if p not in sys.path:
            sys.path.insert(0, p)


def import_reference(module: str):
    """Import e.g. ``gmpi.utils.cam_utils`` with stdout silenced."""
    import contextlib
    import io

    install_stubs()
    with contextlib.redirect_stdout(io.StringIO()):
        __import__(module)
    return sys.modules[module]
