#!/usr/bin/env python
"""One-shot LPIPS weight converter: torchvision VGG16 + official LPIPS
linear weights -> the .npz schema gsplat_tpu/viz/lpips.py loads.

The reference's lpipsPyTorch (modules/networks.py) downloads
``torchvision.models.vgg16(weights=VGG16_Weights.IMAGENET1K_V1)`` and the
per-layer linear weights at runtime.  This image has no torchvision and no
egress, so run this once on any machine that has the two checkpoint files
and copy the resulting .npz next to the model:

    python tools/convert_lpips_weights.py \
        --vgg16 vgg16-397923af.pth \
        --lin   vgg.pth \
        --out   lpips_vgg.npz
    export GSPLAT_LPIPS_WEIGHTS=lpips_vgg.npz

- ``--vgg16``: torchvision VGG16 IMAGENET1K_V1 state dict
  (https://download.pytorch.org/models/vgg16-397923af.pth)
- ``--lin``: official LPIPS v0.1 'vgg' linear weights
  (PerceptualSimilarity weights/v0.1/vgg.pth)

Both are plain ``torch.save``d state dicts — only the baked-in CPU torch is
needed to read them; no torchvision import happens here.
"""
import argparse

import numpy as np

# conv layer positions inside torchvision's features Sequential (cfg 'D')
VGG16_FEATURE_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_sd: dict, lin_sd: dict) -> dict:
    """Map the two torch state dicts into the lpips.py npz schema
    (conv{i}_w OIHW float32, conv{i}_b, lin{j}_w [C])."""
    def _np(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    out = {}
    for i, fi in enumerate(VGG16_FEATURE_CONV_IDX):
        out[f"conv{i}_w"] = _np(vgg_sd[f"features.{fi}.weight"])
        out[f"conv{i}_b"] = _np(vgg_sd[f"features.{fi}.bias"])
    for j in range(5):
        # official key: lin{j}.model.1.weight, shape [1,C,1,1]
        for key in (f"lin{j}.model.1.weight", f"lin{j}.weight",
                    f"lins.{j}.model.1.weight"):
            if key in lin_sd:
                out[f"lin{j}_w"] = _np(lin_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"no linear weight found for layer {j} "
                           f"(keys: {sorted(lin_sd)[:8]}...)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    vgg_sd = torch.load(args.vgg16, map_location="cpu", weights_only=True)
    lin_sd = torch.load(args.lin, map_location="cpu", weights_only=True)
    out = convert(vgg_sd, lin_sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays "
          f"({sum(v.size for v in out.values())/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
