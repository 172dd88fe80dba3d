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


class _TFStub(dict):
    """Attribute-access dict standing in for ``dnnlib.tflib.network.Network``
    (the reference's ``_TFNetworkStub``, ``legacy.py:69-71``)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def _load_pkl_state_dict(args):
    """Extract a torch-style state dict from a StyleGAN2 ``.pkl``.

    TF-era pickles convert via the pure name-mapping table
    (``gmpi_tpu/models/legacy_tf.py`` — no reference code needed); torch-era
    source-pickled modules still need the reference repo on PYTHONPATH to
    unpickle (``persistence.py`` embeds class source)."""
    import pickle

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            # tflib Network and dnnlib EasyDicts all behave as attr-dicts
            if module.startswith("dnnlib"):
                return _TFStub
            return super().find_class(module, name)

    try:
        with open(args.src, "rb") as f:
            data = _Unpickler(f).load()
    except Exception:
        data = None
    if (isinstance(data, tuple) and len(data) == 3
            and all(isinstance(n, _TFStub) for n in data)):
        from gmpi_tpu.models.legacy_tf import (
            collect_tf_params, convert_tf_discriminator_params,
            convert_tf_generator_params)

        tf_g, tf_d, tf_gs = data
        net = {"G": tf_g, "D": tf_d, "G_ema": tf_gs}[args.which]
        res = int(net.static_kwargs.get("resolution", 1024))
        conv = (convert_tf_discriminator_params if args.which == "D"
                else convert_tf_generator_params)
        return conv(collect_tf_params(net), res)
    # torch-era pickle: needs the reference's persistence machinery
    _install_reference(args.reference)
    with open(args.src, "rb") as f:
        data = pickle.Unpickler(f).load()
    net = data[args.which]
    return {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}


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
        sd = _load_pkl_state_dict(args)
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
