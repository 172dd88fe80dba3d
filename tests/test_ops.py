"""StyleGAN2 primitive ops vs torch oracles.

Oracles re-express the reference op semantics with torch primitives:
upfirdn2d = zero-insert -> pad/crop -> FIR conv -> stride-slice
(``gmpi/models/torch_utils/ops/upfirdn2d.py:168-208``), modulated conv =
modulate/conv/demodulate (``networks_cond_on_pos_enc.py:142-199``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gmpi_tpu.ops.bias_act import bias_act
from gmpi_tpu.ops.conv2d import conv2d_resample
from gmpi_tpu.ops.modulated_conv import modulated_conv2d
from gmpi_tpu.ops.upfirdn2d import downsample2d, setup_filter, upfirdn2d, upsample2d


def torch_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), flip_filter=False, gain=1.0):
    """Oracle for upfirdn2d semantics."""
    if isinstance(padding, int):
        padding = (padding,) * 4
    padx0, padx1, pady0, pady1 = padding
    b, c, h, w = x.shape
    # zero-insert upsample (zeros after each pixel)
    x = x.reshape(b, c, h, 1, w, 1)
    x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
    x = x.reshape(b, c, h * up, w * up)
    # pad / crop
    x = F.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0), max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # FIR
    f = f * (gain ** (f.ndim / 2))
    f = f.to(x.dtype)
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    if f.ndim == 1:
        fk = f[None, None, :, None].repeat(c, 1, 1, 1)
        x = F.conv2d(x, fk.transpose(2, 3), groups=c)
        x = F.conv2d(x, fk, groups=c)
    else:
        fk = f[None, None].repeat(c, 1, 1, 1)
        x = F.conv2d(x, fk, groups=c)
    return x[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [(1, 1, 0), (2, 1, 1), (1, 2, 1), (2, 1, (2, 1, 1, 2)), (1, 1, (-1, 2, 0, -1)), (2, 2, 2)])
@pytest.mark.parametrize("flip", [False, True])
def test_upfirdn2d_matches_oracle(up, down, pad, flip):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 12, 10)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    got = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=pad, flip_filter=flip, gain=1.5))
    want = torch_upfirdn2d(torch.from_numpy(x), torch.from_numpy(np.asarray(f)), up, down, pad, flip, 1.5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_setup_filter_default():
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    # outer product of normalized [1,3,3,1]
    base = np.array([1, 3, 3, 1], dtype=np.float32) / 8.0
    np.testing.assert_allclose(f, np.outer(base, base), rtol=1e-6)


def test_upsample_downsample_roundtrip_dc():
    """DC gain: upsample then downsample preserves a constant signal."""
    f = setup_filter([1, 3, 3, 1])
    x = jnp.full((1, 2, 16, 16), 3.25, dtype=jnp.float32)
    up = upsample2d(x, f)
    assert up.shape == (1, 2, 32, 32)
    # interior of constant image stays constant under partition-of-unity filter
    np.testing.assert_allclose(np.asarray(up)[:, :, 8:-8, 8:-8], 3.25, rtol=1e-5)
    down = downsample2d(up, f)
    assert down.shape == (1, 2, 16, 16)
    np.testing.assert_allclose(np.asarray(down)[:, :, 4:-4, 4:-4], 3.25, rtol=1e-5)


@pytest.mark.parametrize("act,gain,clamp", [("linear", None, None), ("lrelu", None, 256.0), ("tanh", 2.0, None), ("swish", None, 1.0), ("relu", None, None), ("sigmoid", None, None), ("elu", None, None), ("selu", None, None), ("softplus", None, None)])
def test_bias_act_matches_torch(act, gain, clamp):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4, 8, 5, 5)) * 3).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)

    tx = torch.from_numpy(x) + torch.from_numpy(b).reshape(1, -1, 1, 1)
    fn = {
        "linear": lambda v: v,
        "relu": torch.relu,
        "lrelu": lambda v: F.leaky_relu(v, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": F.elu,
        "selu": F.selu,
        "softplus": F.softplus,
        "swish": lambda v: torch.sigmoid(v) * v,
    }[act]
    want = fn(tx)
    def_gain = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}.get(act, 1.0)
    g = def_gain if gain is None else gain
    want = want * g
    if clamp is not None:
        want = want.clamp(-clamp, clamp)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act, gain=gain, clamp=clamp))
    # transcendentals (tanh/sigmoid/...) differ in ulps between XLA and torch
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("up,down,k", [(1, 1, 3), (2, 1, 3), (1, 2, 3), (1, 1, 1)])
def test_conv2d_resample_matches_oracle(up, down, k):
    """conv2d_resample == upfirdn(up, gain=up^2) -> conv -> upfirdn(down),
    with the reference's pad adjustment — oracle built from torch pieces."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    w = rng.standard_normal((7, 5, k, k)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    pad = k // 2
    flip_weight = up == 1

    got = np.asarray(
        conv2d_resample(jnp.asarray(x), jnp.asarray(w), f, up=up, down=down, padding=pad, flip_weight=flip_weight)
    )

    # oracle
    tx, tw, tf = torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(np.asarray(f))
    fw = fh = 4
    px0 = px1 = py0 = py1 = pad
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    y = torch_upfirdn2d(tx, tf if up > 1 else torch.ones(1, 1), up=up, padding=(px0, px1, py0, py1), gain=up * up)
    ww = tw if flip_weight else tw.flip([2, 3])
    y = F.conv2d(y, ww)
    if down > 1:
        y = torch_upfirdn2d(y, tf, down=down)
    np.testing.assert_allclose(got, y.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("demodulate,up", [(True, 1), (False, 1), (True, 2)])
def test_modulated_conv2d_matches_oracle(demodulate, up):
    """Scale-activations path == reference fused grouped-conv path."""
    rng = np.random.default_rng(5)
    n, ci, co, k, h = 3, 6, 8, 3, 8
    x = rng.standard_normal((n, ci, h, h)).astype(np.float32)
    w = rng.standard_normal((co, ci, k, k)).astype(np.float32)
    s = (rng.standard_normal((n, ci)) * 0.5 + 1.0).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])

    got = np.asarray(
        modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
            up=up, padding=k // 2, resample_filter=f if up > 1 else None,
            demodulate=demodulate, flip_weight=(up == 1),
        )
    )

    # oracle: fused grouped-conv formulation in torch
    tx, tw, ts = torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(s)
    wmod = tw[None] * ts.reshape(n, 1, ci, 1, 1)
    if demodulate:
        d = (wmod.square().sum(dim=(2, 3, 4)) + 1e-8).rsqrt()
        wmod = wmod * d.reshape(n, co, 1, 1, 1)
    wg = wmod.reshape(n * co, ci, k, k)
    xg = tx.reshape(1, n * ci, h, h)
    if up == 1:
        y = F.conv2d(xg, wg, padding=k // 2, groups=n).reshape(n, co, h, h)
    else:
        # conv_transpose for up=2 then FIR — use the canonical composition:
        # zero-insert + FIR(gain=4) + conv(flipped w)
        fw = fh = 4
        px0 = k // 2 + (fw + up - 1) // 2
        px1 = k // 2 + (fw - up) // 2
        y = torch_upfirdn2d(xg, torch.from_numpy(np.asarray(f)), up=up, padding=(px0, px1, px0, px1), gain=up * up)
        y = F.conv2d(y, wg.flip([2, 3]), groups=n)
        y = y.reshape(n, co, h * up, h * up)
    np.testing.assert_allclose(got, y.numpy(), rtol=2e-4, atol=2e-4)
