#!/usr/bin/env python
"""One-shot LPIPS weight converter: torchvision backbone + official LPIPS
linear weights -> the .npz schema gsplat_tpu/viz/lpips.py loads.

The reference's lpipsPyTorch (modules/networks.py) downloads a torchvision
backbone at runtime — 'alex' by default (lpipsPyTorch/__init__.py:8), plus
'squeeze' and 'vgg'.  This image has no torchvision and no egress, so run
this once on any machine that has the two checkpoint files and copy the
resulting .npz next to the model:

    python tools/convert_lpips_weights.py --net alex \
        --backbone alexnet-owt-7be5be79.pth \
        --lin      alex.pth \
        --out      lpips_alex.npz
    export GSPLAT_LPIPS_WEIGHTS=lpips_alex.npz

- ``--backbone``: torchvision IMAGENET1K_V1 state dict for the chosen net
  (vgg16-397923af.pth / alexnet-owt-7be5be79.pth /
  squeezenet1_1-b8a52dc0.pth)
- ``--lin``: official LPIPS v0.1 linear weights for the same net
  (PerceptualSimilarity weights/v0.1/{vgg,alex,squeeze}.pth)

Both are plain ``torch.save``d state dicts — only the baked-in CPU torch is
needed to read them; no torchvision import happens here.
"""
import argparse

import numpy as np

# conv layer positions inside each backbone's ``features`` Sequential
VGG16_FEATURE_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
ALEXNET_FEATURE_CONV_IDX = [0, 3, 6, 8, 10]
SQUEEZE11_FIRE_IDX = [3, 4, 6, 7, 9, 10, 11, 12]  # features.{i} Fire modules
N_LINS = {"vgg": 5, "alex": 5, "squeeze": 7}


def _np(t):
    return np.asarray(t.detach().cpu().numpy()
                      if hasattr(t, "detach") else t, np.float32)


def _lin_weights(lin_sd, n):
    out = {}
    for j in range(n):
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


def convert(backbone_sd: dict, lin_sd: dict, net: str = "vgg") -> dict:
    """Map the two torch state dicts into the lpips.py npz schema
    (conv{i}_w OIHW float32 / conv{i}_b; fire{k}_* for squeeze;
    lin{j}_w [C]; net_type tag)."""
    out = {"net_type": np.asarray(net)}
    if net in ("vgg", "alex"):
        idx = (VGG16_FEATURE_CONV_IDX if net == "vgg"
               else ALEXNET_FEATURE_CONV_IDX)
        for i, fi in enumerate(idx):
            out[f"conv{i}_w"] = _np(backbone_sd[f"features.{fi}.weight"])
            out[f"conv{i}_b"] = _np(backbone_sd[f"features.{fi}.bias"])
    elif net == "squeeze":
        out["conv0_w"] = _np(backbone_sd["features.0.weight"])
        out["conv0_b"] = _np(backbone_sd["features.0.bias"])
        for k, fi in enumerate(SQUEEZE11_FIRE_IDX):
            for part, tkey in (("squeeze", "squeeze"), ("e1", "expand1x1"),
                               ("e3", "expand3x3")):
                out[f"fire{k}_{part}_w"] = _np(
                    backbone_sd[f"features.{fi}.{tkey}.weight"])
                out[f"fire{k}_{part}_b"] = _np(
                    backbone_sd[f"features.{fi}.{tkey}.bias"])
    else:
        raise ValueError(f"unknown net {net!r}")
    out.update(_lin_weights(lin_sd, N_LINS[net]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="alex",
                    choices=("alex", "squeeze", "vgg"))
    ap.add_argument("--backbone", help="torchvision state dict")
    ap.add_argument("--vgg16", help="legacy alias for --backbone (vgg)")
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    backbone = args.backbone or args.vgg16
    if not backbone:
        ap.error("--backbone is required")
    if args.vgg16:
        args.net = "vgg"

    import torch
    backbone_sd = torch.load(backbone, map_location="cpu", weights_only=True)
    lin_sd = torch.load(args.lin, map_location="cpu", weights_only=True)
    out = convert(backbone_sd, lin_sd, args.net)
    path = args.out or f"lpips_{args.net}.npz"
    np.savez(path, **out)
    n = sum(v.size for v in out.values() if v.dtype != object)
    print(f"wrote {path}: {len(out)} arrays ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
