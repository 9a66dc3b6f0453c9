"""LPIPS perceptual metric — reference lpipsPyTorch/ equivalent.

The reference vendors a torch LPIPS whose backbone weights download from
torchvision at runtime (lpipsPyTorch/modules/networks.py: 'alex' default,
plus 'squeeze' and 'vgg' — __init__.py:8) and ships it DISABLED in
metrics.py:74-78.  This environment has no torchvision and no network
egress, so pretrained backbones cannot exist locally; we implement the same
three backbones in jax (feature stack + unit-normalize + per-layer 1x1
linear weighting + spatial mean, summed over layers — modules/lpips.py) and
load weights from a local .npz the user provides via GSPLAT_LPIPS_WEIGHTS
(produced by tools/convert_lpips_weights.py from the official torch
checkpoints).  Without weights, constructing LPIPS raises — metrics.py
catches that and reports SSIM/PSNR only, exactly the reference's effective
behavior.

Input convention: images in [0,1], converted to [-1,1] before the z-score
layer — the official richzhang LPIPS v0.1 ``normalize=True`` semantics that
published figures use.  (The reference's vendored port z-scores its input
directly and its callers pass [0,1]; that omission is a known quirk of that
port, not replicated here.)
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
# conv counts after ReLUs 1_2, 2_2, 3_3, 4_3, 5_3 (lpips 'vgg')
SLICE_ENDS = (2, 4, 7, 10, 13)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_layers():
    """1-based torch-module list for torchvision vgg16.features."""
    out = []
    for c in VGG_CFG:
        if c == "M":
            out.append(("pool", (2, 2, False)))
        else:
            out.append(("conv", (c, 3, 1, 1)))
            out.append(("relu", None))
    return out


# layer descriptors: ("conv", (out_c, k, stride, pad)), ("relu", None),
# ("pool", (k, stride, ceil_mode)), ("fire", (squeeze_c, e1_c, e3_c)).
# ``targets`` are the reference's 1-based target_layers
# (lpipsPyTorch/modules/networks.py:69-97).
NET_SPECS = {
    "vgg": {
        "layers": _vgg_layers(),
        "targets": (4, 9, 16, 23, 30),
        "channels": (64, 128, 256, 512, 512),
    },
    "alex": {
        "layers": [
            ("conv", (64, 11, 4, 2)), ("relu", None),
            ("pool", (3, 2, False)),
            ("conv", (192, 5, 1, 2)), ("relu", None),
            ("pool", (3, 2, False)),
            ("conv", (384, 3, 1, 1)), ("relu", None),
            ("conv", (256, 3, 1, 1)), ("relu", None),
            ("conv", (256, 3, 1, 1)), ("relu", None),
            ("pool", (3, 2, False)),
        ],
        "targets": (2, 5, 8, 10, 12),
        "channels": (64, 192, 384, 256, 256),
    },
    "squeeze": {
        "layers": [
            ("conv", (64, 3, 2, 0)), ("relu", None),
            ("pool", (3, 2, True)),
            ("fire", (16, 64, 64)), ("fire", (16, 64, 64)),
            ("pool", (3, 2, True)),
            ("fire", (32, 128, 128)), ("fire", (32, 128, 128)),
            ("pool", (3, 2, True)),
            ("fire", (48, 192, 192)), ("fire", (48, 192, 192)),
            ("fire", (64, 256, 256)), ("fire", (64, 256, 256)),
        ],
        "targets": (2, 5, 8, 10, 11, 12, 13),
        "channels": (64, 128, 256, 384, 384, 512, 512),
    },
}


def _conv(h, w, b, stride=1, pad=0):
    h = jax.lax.conv_general_dilated(
        h, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return h + b[None, :, None, None]


def _maxpool(h, k, s, ceil_mode):
    if ceil_mode:
        # torch ceil_mode pads the bottom/right so the last window (which
        # must start inside the input) is included
        H, W = h.shape[2], h.shape[3]
        ph = (-(H - k) % s) if H > k else 0
        pw = (-(W - k) % s) if W > k else 0
        pad = [(0, 0), (0, 0), (0, ph), (0, pw)]
    else:
        pad = [(0, 0)] * 4
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), pad)


class LPIPS:
    """net_type: 'alex' (reference default, lpipsPyTorch/__init__.py:8),
    'vgg' or 'squeeze'.  None = take the net recorded in the weights file
    (legacy vgg-only files carry no tag and load as 'vgg')."""

    def __init__(self, weights_path: str | None = None,
                 net_type: str | None = None):
        weights_path = weights_path or os.environ.get("GSPLAT_LPIPS_WEIGHTS")
        if not weights_path or not os.path.exists(weights_path):
            raise FileNotFoundError(
                "LPIPS needs pretrained backbone+linear weights (.npz from "
                "tools/convert_lpips_weights.py); set GSPLAT_LPIPS_WEIGHTS. "
                "No network egress in this environment — like the reference, "
                "LPIPS stays disabled without local weights.")
        z = np.load(weights_path)
        file_net = str(z["net_type"]) if "net_type" in z else "vgg"
        self.net_type = net_type or file_net
        if self.net_type != file_net:
            raise ValueError(f"weights file is for net '{file_net}', "
                             f"requested '{self.net_type}'")
        spec = NET_SPECS[self.net_type]
        self.layers, self.targets = spec["layers"], set(spec["targets"])
        self.params = []
        ci = fi = 0
        for kind, _ in self.layers:
            if kind == "conv":
                self.params.append((jnp.asarray(z[f"conv{ci}_w"]),
                                    jnp.asarray(z[f"conv{ci}_b"])))
                ci += 1
            elif kind == "fire":
                self.params.append(tuple(
                    jnp.asarray(z[f"fire{fi}_{part}"])
                    for part in ("squeeze_w", "squeeze_b", "e1_w", "e1_b",
                                 "e3_w", "e3_b")))
                fi += 1
            else:
                self.params.append(None)
        self.lins = [jnp.asarray(z[f"lin{j}_w"])
                     for j in range(len(spec["channels"]))]
        self._fn = jax.jit(self._distance)

    def _features(self, x):
        """x: [3,H,W] in [0,1] -> feature maps at the target layers."""
        x = (x * 2.0 - 1.0 - _SHIFT[:, None, None]) / _SCALE[:, None, None]
        h = x[None]
        feats = []
        for i, ((kind, arg), p) in enumerate(zip(self.layers, self.params),
                                             start=1):
            if kind == "conv":
                c, k, s, pad = arg
                h = _conv(h, p[0], p[1], s, pad)
            elif kind == "relu":
                h = jax.nn.relu(h)
            elif kind == "pool":
                h = _maxpool(h, *arg)
            elif kind == "fire":
                sw, sb, e1w, e1b, e3w, e3b = p
                sq = jax.nn.relu(_conv(h, sw, sb))
                h = jnp.concatenate(
                    [jax.nn.relu(_conv(sq, e1w, e1b)),
                     jax.nn.relu(_conv(sq, e3w, e3b, pad=1))], axis=1)
            if i in self.targets:
                feats.append(h)
        return feats

    def _distance(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for f1, f2, lin in zip(fa, fb, self.lins):
            n1 = f1 / (jnp.linalg.norm(f1, axis=1, keepdims=True) + 1e-10)
            n2 = f2 / (jnp.linalg.norm(f2, axis=1, keepdims=True) + 1e-10)
            d = (n1 - n2) ** 2
            w = lin.reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total

    def __call__(self, img_a, img_b) -> float:
        return float(self._fn(jnp.asarray(img_a), jnp.asarray(img_b)))
