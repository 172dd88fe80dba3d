#!/usr/bin/env python
"""Offline checkpoint conversion — released torch checkpoints -> gmpi_tpu.

Two source formats:

* GMPI release checkpoints (``generator.pth`` / ``ema.pth``): plain torch
  state dicts — converted directly.
* NVIDIA StyleGAN2-ADA ``.pkl`` (source-pickled modules): unpickling needs
  the reference repo's ``legacy``/``dnnlib``/``torch_utils`` on PYTHONPATH
  (pass ``--reference /root/reference``); we extract ``G_ema``'s state dict
  and convert (the reference warm start also copies from G_ema,
  ``gmpi/train.py:216-224``).

Output: a flat ``.npz`` in the reference naming — loadable by
``train_gmpi.py --warm_start`` and ``models/converter.py``.
"""

from __future__ import annotations

import argparse
import os
import sys


def _install_reference(path: str) -> None:
    import functools
    import types

    for mod, attr in (("yacs", None), ("lazy", "lazy")):
        if mod in sys.modules:
            continue
        m = types.ModuleType(mod)
        if mod == "yacs":
            cfg = types.ModuleType("yacs.config")
            cfg.CfgNode = dict
            m.config = cfg
            sys.modules["yacs.config"] = cfg
        else:
            def lazy(fn):
                a = "_lazy_" + fn.__name__

                @property
                @functools.wraps(fn)
                def wrapper(self):
                    if not hasattr(self, a):
                        setattr(self, a, fn(self))
                    return getattr(self, a)

                return wrapper

            m.lazy = lazy
        sys.modules[mod] = m
    for p in (path, os.path.join(path, "gmpi", "models")):
        if p not in sys.path:
            sys.path.insert(0, p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".pth state dict or StyleGAN2 .pkl")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--reference", default="/root/reference",
                    help="reference repo path (needed for .pkl sources)")
    ap.add_argument("--which", default="G_ema", choices=["G_ema", "G", "D"],
                    help="which network to extract from a .pkl")
    args = ap.parse_args()

    import numpy as np
    import torch

    if args.src.endswith(".pkl"):
        _install_reference(args.reference)
        import pickle

        with open(args.src, "rb") as f:
            data = pickle.Unpickler(f).load()
        net = data[args.which]
        sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    else:
        obj = torch.load(args.src, map_location="cpu", weights_only=False)
        if not isinstance(obj, dict):
            obj = obj.state_dict()
        # training checkpoints may nest multiple nets
        for key in ("generator", "G_ema", "ema", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
              for k, v in obj.items() if hasattr(v, "shape")}

    np.savez(args.out, **sd)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
