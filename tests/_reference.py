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
    if "torchvision" not in sys.modules:
        # import-time only: fid_score.py / inception.py import torchvision at
        # module top, but calculate_frechet_distance is pure numpy/scipy
        tv = types.ModuleType("torchvision")
        tv_tf = types.ModuleType("torchvision.transforms")
        tv_m = types.ModuleType("torchvision.models")
        tv_mu = types.ModuleType("torchvision.models.utils")

        def _no_url(*a, **k):
            raise RuntimeError("zero-egress test stub")

        tv_mu.load_state_dict_from_url = _no_url
        tv.transforms = tv_tf
        tv.models = tv_m
        tv_m.utils = tv_mu
        tv.__version__ = "0.0"
        # inception.py subclasses these at module level; the FID-math oracle
        # (calculate_frechet_distance) never instantiates them
        tv_inc = types.ModuleType("torchvision.models.inception")
        import torch.nn as _nn

        for cls in ("InceptionA", "InceptionC", "InceptionE"):
            setattr(tv_inc, cls, type(cls, (_nn.Module,), {}))
        tv_m.inception = tv_inc
        tv_m.inception_v3 = _no_url
        sys.modules["torchvision.models.inception"] = tv_inc
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_tf
        sys.modules["torchvision.models"] = tv_m
        sys.modules["torchvision.models.utils"] = tv_mu
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
