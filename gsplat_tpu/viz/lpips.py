"""LPIPS perceptual metric — reference lpipsPyTorch/ equivalent.

The reference vendors a torch LPIPS whose backbone weights download from
torchvision at runtime (lpipsPyTorch/modules/networks.py) and ships it
DISABLED in metrics.py:74-78.  This environment has no torchvision and no
network egress, so pretrained backbones cannot exist locally; we implement
the same interface in jax (VGG-16 feature stack + unit-normalize + per-layer
weighted L2, matching the LPIPS 'vgg' variant structure) and load weights
from a local .npz if the user provides one via GSPLAT_LPIPS_WEIGHTS.
Without weights, constructing LPIPS raises — metrics.py catches that and
reports SSIM/PSNR only, exactly the reference's effective behavior.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
# slice boundaries after ReLUs 1_2, 2_2, 3_3, 4_3, 5_3 (lpips 'vgg')
SLICE_ENDS = (2, 4, 7, 10, 13)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights_path: str | None = None):
        weights_path = weights_path or os.environ.get("GSPLAT_LPIPS_WEIGHTS")
        if not weights_path or not os.path.exists(weights_path):
            raise FileNotFoundError(
                "LPIPS needs pretrained VGG+linear weights (.npz with "
                "conv{i}_w/b and lin{j}_w); set GSPLAT_LPIPS_WEIGHTS. "
                "No network egress in this environment — like the reference, "
                "LPIPS stays disabled without local weights.")
        z = np.load(weights_path)
        self.convs = []
        i = 0
        for c in VGG_CFG:
            if c == "M":
                continue
            self.convs.append((jnp.asarray(z[f"conv{i}_w"]),
                               jnp.asarray(z[f"conv{i}_b"])))
            i += 1
        self.lins = [jnp.asarray(z[f"lin{j}_w"]) for j in range(5)]
        self._fn = jax.jit(self._distance)

    def _features(self, x):
        """x: [3,H,W] in [0,1] -> list of feature maps at SLICE_ENDS."""
        x = (x * 2.0 - 1.0 - _SHIFT[:, None, None]) / _SCALE[:, None, None]
        h = x[None]
        feats = []
        conv_i = 0
        for c in VGG_CFG:
            if c == "M":
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
                continue
            w, b = self.convs[conv_i]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            h = jax.nn.relu(h + b[None, :, None, None])
            conv_i += 1
            if conv_i in SLICE_ENDS:
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
