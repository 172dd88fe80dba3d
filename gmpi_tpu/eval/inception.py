"""InceptionV3 (FID variant) feature extractor in JAX.

The reference computes FID through torch_fidelity / a vendored pytorch_fid
(``gmpi/utils/pytorch_fid``), both of which download pretrained InceptionV3
weights.  This module implements the same network — torchvision InceptionV3
with the pytorch-fid pooling modifications — as pure JAX over a parameter
pytree, plus a converter from the torchvision/pytorch-fid state-dict naming.

This container has no network egress, so weights must be supplied as a local
``.npz``/``.pth`` (``load_params``); the architecture, preprocessing
(299-resize + ImageNet normalization is NOT used by pytorch-fid — it feeds
[0,1] images scaled to [-1,1] via ``2x-1``), and pool3 feature head follow
pytorch_fid's ``InceptionV3(output_blocks=[3])``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conv(x, w, stride=1, padding=0):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NCHW", "OIHW", "NCHW")
    )


def _bn(x, p, eps=1e-3):
    mean = p["running_mean"].reshape(1, -1, 1, 1)
    var = p["running_var"].reshape(1, -1, 1, 1)
    w = p.get("weight")
    b = p.get("bias")
    x = (x - mean) * lax.rsqrt(var + eps)
    if w is not None:
        x = x * w.reshape(1, -1, 1, 1)
    if b is not None:
        x = x + b.reshape(1, -1, 1, 1)
    return x


def _basic_conv(x, p, stride=1, padding=0):
    """torchvision BasicConv2d: conv (no bias) + BN(eps 1e-3) + relu."""
    x = _conv(x, p["conv"]["weight"], stride, padding)
    return jax.nn.relu(_bn(x, p["bn"]))


def _maxpool(x, size=3, stride=2, padding=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, size, size), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)),
    )


def _avgpool(x, size=3, stride=1, padding=1, count_include_pad=True):
    ones = jnp.ones_like(x)
    pad = ((0, 0), (0, 0), (padding, padding), (padding, padding))
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, size, size), (1, 1, stride, stride), pad)
    if count_include_pad:
        return s / (size * size)
    c = lax.reduce_window(ones, 0.0, lax.add, (1, 1, size, size), (1, 1, stride, stride), pad)
    return s / c


def _inception_a(x, p, fid: bool):
    b1 = _basic_conv(x, p["branch1x1"])
    b5 = _basic_conv(x, p["branch5x5_1"])
    b5 = _basic_conv(b5, p["branch5x5_2"], padding=2)
    b3 = _basic_conv(x, p["branch3x3dbl_1"])
    b3 = _basic_conv(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _basic_conv(b3, p["branch3x3dbl_3"], padding=1)
    # pytorch-fid: avg_pool count_include_pad=False
    bp = _avgpool(x, 3, 1, 1, count_include_pad=not fid)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(x, p):
    b3 = _basic_conv(x, p["branch3x3"], stride=2)
    bd = _basic_conv(x, p["branch3x3dbl_1"])
    bd = _basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = _basic_conv(bd, p["branch3x3dbl_3"], stride=2)
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(x, p, fid: bool):
    b1 = _basic_conv(x, p["branch1x1"])
    b7 = _basic_conv(x, p["branch7x7_1"])
    b7 = _basic_conv(b7, p["branch7x7_2"], padding=((0, 0), (3, 3)))
    b7 = _basic_conv(b7, p["branch7x7_3"], padding=((3, 3), (0, 0)))
    bd = _basic_conv(x, p["branch7x7dbl_1"])
    bd = _basic_conv(bd, p["branch7x7dbl_2"], padding=((3, 3), (0, 0)))
    bd = _basic_conv(bd, p["branch7x7dbl_3"], padding=((0, 0), (3, 3)))
    bd = _basic_conv(bd, p["branch7x7dbl_4"], padding=((3, 3), (0, 0)))
    bd = _basic_conv(bd, p["branch7x7dbl_5"], padding=((0, 0), (3, 3)))
    bp = _avgpool(x, 3, 1, 1, count_include_pad=not fid)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(x, p):
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = _basic_conv(b3, p["branch3x3_2"], stride=2)
    b7 = _basic_conv(x, p["branch7x7x3_1"])
    b7 = _basic_conv(b7, p["branch7x7x3_2"], padding=((0, 0), (3, 3)))
    b7 = _basic_conv(b7, p["branch7x7x3_3"], padding=((3, 3), (0, 0)))
    b7 = _basic_conv(b7, p["branch7x7x3_4"], stride=2)
    bp = _maxpool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(x, p, pool: str):
    b1 = _basic_conv(x, p["branch1x1"])
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _basic_conv(b3, p["branch3x3_2a"], padding=((0, 0), (1, 1))),
        _basic_conv(b3, p["branch3x3_2b"], padding=((1, 1), (0, 0))),
    ], axis=1)
    bd = _basic_conv(x, p["branch3x3dbl_1"])
    bd = _basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([
        _basic_conv(bd, p["branch3x3dbl_3a"], padding=((0, 0), (1, 1))),
        _basic_conv(bd, p["branch3x3dbl_3b"], padding=((1, 1), (0, 0))),
    ], axis=1)
    if pool == "avg_fid":  # FIDInceptionE_1: count_include_pad=False
        bp = _avgpool(x, 3, 1, 1, count_include_pad=False)
    elif pool == "max":  # FIDInceptionE_2: max pool
        bp = _maxpool(x, 3, 1, 1)
    else:
        bp = _avgpool(x, 3, 1, 1, count_include_pad=True)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


LAYERS = [
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
    "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
    "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
    "Mixed_7c",
]


def inception_pool3(params: Dict, x: jnp.ndarray, fid_variant: bool = True) -> jnp.ndarray:
    """x [N, 3, H, W] in [0, 1] -> pool3 features [N, 2048].

    Follows pytorch_fid: bilinear resize to 299, scale to [-1, 1], run the
    trunk, global average pool.
    """
    x = jax.image.resize(x, (x.shape[0], 3, 299, 299), method="bilinear")
    x = x * 2.0 - 1.0
    p = params
    x = _basic_conv(x, p["Conv2d_1a_3x3"], stride=2)
    x = _basic_conv(x, p["Conv2d_2a_3x3"])
    x = _basic_conv(x, p["Conv2d_2b_3x3"], padding=1)
    x = _maxpool(x, 3, 2)
    x = _basic_conv(x, p["Conv2d_3b_1x1"])
    x = _basic_conv(x, p["Conv2d_4a_3x3"])
    x = _maxpool(x, 3, 2)
    x = _inception_a(x, p["Mixed_5b"], fid_variant)
    x = _inception_a(x, p["Mixed_5c"], fid_variant)
    x = _inception_a(x, p["Mixed_5d"], fid_variant)
    x = _inception_b(x, p["Mixed_6a"])
    x = _inception_c(x, p["Mixed_6b"], fid_variant)
    x = _inception_c(x, p["Mixed_6c"], fid_variant)
    x = _inception_c(x, p["Mixed_6d"], fid_variant)
    x = _inception_c(x, p["Mixed_6e"], fid_variant)
    x = _inception_d(x, p["Mixed_7a"])
    x = _inception_e(x, p["Mixed_7b"], "avg_fid" if fid_variant else "avg")
    x = _inception_e(x, p["Mixed_7c"], "max" if fid_variant else "avg")
    return jnp.mean(x, axis=(2, 3))


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision/pytorch-fid naming -> nested param tree.

    Keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}``."""
    tree: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked" or parts[0] in ("fc", "AuxLogits"):
            continue
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(np.asarray(val), jnp.float32)
    return tree


def load_params(path: str) -> Dict:
    """Load weights from ``.npz`` (flat torch naming) or a torch ``.pth``."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            sd = {k: data[k] for k in data.files}
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: v.detach().cpu().numpy() for k, v in obj.items()}
    return convert_torch_state_dict(sd)


def make_feature_fn(params: Dict, batch: int = 32):
    """Batched numpy-in/numpy-out pool3 extractor for the eval harness."""
    fn = jax.jit(lambda x: inception_pool3(params, x))

    def feature_fn(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch):
            out.append(np.asarray(fn(jnp.asarray(images[i : i + batch], jnp.float32))))
        return np.concatenate(out)

    return feature_fn


# -- random init (structure tests / smoke only) -----------------------------


def _rand_basic(key, cin, cout, kh, kw):
    k1, _ = jax.random.split(key)
    return {
        "conv": {"weight": jax.random.normal(k1, (cout, cin, kh, kw)) * 0.05},
        "bn": {
            "weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
            "running_mean": jnp.zeros((cout,)), "running_var": jnp.ones((cout,)),
        },
    }


def random_params(key: jax.Array) -> Dict:
    """Random-weight tree with the correct shapes (tests only)."""
    keys = iter(jax.random.split(key, 200))

    def nb(cin, cout, kh=1, kw=1):
        return _rand_basic(next(keys), cin, cout, kh, kw)

    def mixed_a(cin, pool_feat):
        return {
            "branch1x1": nb(cin, 64), "branch5x5_1": nb(cin, 48),
            "branch5x5_2": nb(48, 64, 5, 5), "branch3x3dbl_1": nb(cin, 64),
            "branch3x3dbl_2": nb(64, 96, 3, 3), "branch3x3dbl_3": nb(96, 96, 3, 3),
            "branch_pool": nb(cin, pool_feat),
        }

    def mixed_c(cin, c7):
        return {
            "branch1x1": nb(cin, 192), "branch7x7_1": nb(cin, c7),
            "branch7x7_2": nb(c7, c7, 1, 7), "branch7x7_3": nb(c7, 192, 7, 1),
            "branch7x7dbl_1": nb(cin, c7), "branch7x7dbl_2": nb(c7, c7, 7, 1),
            "branch7x7dbl_3": nb(c7, c7, 1, 7), "branch7x7dbl_4": nb(c7, c7, 7, 1),
            "branch7x7dbl_5": nb(c7, 192, 1, 7), "branch_pool": nb(cin, 192),
        }

    def mixed_e(cin):
        return {
            "branch1x1": nb(cin, 320), "branch3x3_1": nb(cin, 384),
            "branch3x3_2a": nb(384, 384, 1, 3), "branch3x3_2b": nb(384, 384, 3, 1),
            "branch3x3dbl_1": nb(cin, 448), "branch3x3dbl_2": nb(448, 384, 3, 3),
            "branch3x3dbl_3a": nb(384, 384, 1, 3), "branch3x3dbl_3b": nb(384, 384, 3, 1),
            "branch_pool": nb(cin, 192),
        }

    return {
        "Conv2d_1a_3x3": nb(3, 32, 3, 3),
        "Conv2d_2a_3x3": nb(32, 32, 3, 3),
        "Conv2d_2b_3x3": nb(32, 64, 3, 3),
        "Conv2d_3b_1x1": nb(64, 80),
        "Conv2d_4a_3x3": nb(80, 192, 3, 3),
        "Mixed_5b": mixed_a(192, 32),
        "Mixed_5c": mixed_a(256, 64),
        "Mixed_5d": mixed_a(288, 64),
        "Mixed_6a": {
            "branch3x3": nb(288, 384, 3, 3), "branch3x3dbl_1": nb(288, 64),
            "branch3x3dbl_2": nb(64, 96, 3, 3), "branch3x3dbl_3": nb(96, 96, 3, 3),
        },
        "Mixed_6b": mixed_c(768, 128),
        "Mixed_6c": mixed_c(768, 160),
        "Mixed_6d": mixed_c(768, 160),
        "Mixed_6e": mixed_c(768, 192),
        "Mixed_7a": {
            "branch3x3_1": nb(768, 192), "branch3x3_2": nb(192, 320, 3, 3),
            "branch7x7x3_1": nb(768, 192), "branch7x7x3_2": nb(192, 192, 1, 7),
            "branch7x7x3_3": nb(192, 192, 7, 1), "branch7x7x3_4": nb(192, 192, 3, 3),
        },
        "Mixed_7b": mixed_e(1280),
        "Mixed_7c": mixed_e(2048),
    }
