"""Official DPT torch checkpoint -> JAX param pytree.

The public MiDaS/DPT weights (e.g. dpt_hybrid-midas-501f0c75.pt,
dpt_large-midas-2f21e586.pt) are plain ``torch.save``d state dicts with timm
vision-transformer naming — no timm/torchvision needed to read them.  Key
schema documented against the reference model builders
(/root/reference/DPT/dpt/vit.py:221-530, models.py:26-106).

Conventions converted here:
- conv weights OIHW -> HWIO
- linear weights [out,in] -> [in,out]
- ConvTranspose2d [in,out,kh,kw] -> [kh,kw,in,out]
- BatchNorm running stats kept for inference-mode folding
"""
from __future__ import annotations

import numpy as np

from gsplat_tpu.depth.dpt import DPTConfig


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _conv(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)           # OIHW -> HWIO


def _lin(sd, key):
    return _np(sd[key]).T                               # [out,in] -> [in,out]


def _deconv(sd, key):
    return _np(sd[key]).transpose(2, 3, 0, 1)           # [in,out,k,k] -> HW,in,out


def _bn(sd, prefix):
    return dict(gamma=_np(sd[prefix + ".weight"]),
                beta=_np(sd[prefix + ".bias"]),
                mean=_np(sd[prefix + ".running_mean"]),
                var=_np(sd[prefix + ".running_var"]))


def _vit_block(sd, i):
    p = f"pretrained.model.blocks.{i}."
    return dict(
        norm1_g=_np(sd[p + "norm1.weight"]), norm1_b=_np(sd[p + "norm1.bias"]),
        attn=dict(qkv_w=_lin(sd, p + "attn.qkv.weight"),
                  qkv_b=_np(sd[p + "attn.qkv.bias"]),
                  proj_w=_lin(sd, p + "attn.proj.weight"),
                  proj_b=_np(sd[p + "attn.proj.bias"])),
        norm2_g=_np(sd[p + "norm2.weight"]), norm2_b=_np(sd[p + "norm2.bias"]),
        fc1_w=_lin(sd, p + "mlp.fc1.weight"), fc1_b=_np(sd[p + "mlp.fc1.bias"]),
        fc2_w=_lin(sd, p + "mlp.fc2.weight"), fc2_b=_np(sd[p + "mlp.fc2.bias"]),
    )


def _resnet_stage(sd, si, nblk):
    blocks = []
    for bi in range(nblk):
        p = f"pretrained.model.patch_embed.backbone.stages.{si}.blocks.{bi}."
        b = dict(
            conv1_w=_conv(sd, p + "conv1.weight"),
            norm1_g=_np(sd[p + "norm1.weight"]), norm1_b=_np(sd[p + "norm1.bias"]),
            conv2_w=_conv(sd, p + "conv2.weight"),
            norm2_g=_np(sd[p + "norm2.weight"]), norm2_b=_np(sd[p + "norm2.bias"]),
            conv3_w=_conv(sd, p + "conv3.weight"),
            norm3_g=_np(sd[p + "norm3.weight"]), norm3_b=_np(sd[p + "norm3.bias"]),
        )
        if p + "downsample.conv.weight" in sd:
            b["downsample"] = dict(
                conv_w=_conv(sd, p + "downsample.conv.weight"),
                norm_g=_np(sd[p + "downsample.norm.weight"]),
                norm_b=_np(sd[p + "downsample.norm.bias"]))
        blocks.append(b)
    return dict(blocks=blocks)


def _post(sd, n, kind):
    p = f"pretrained.act_postprocess{n}."
    d = dict(readout=dict(w=_lin(sd, p + "0.project.0.weight"),
                          b=_np(sd[p + "0.project.0.bias"])),
             conv_w=_conv(sd, p + "3.weight"), conv_b=_np(sd[p + "3.bias"]))
    if kind in ("up4", "up2"):
        d["up_w"] = _deconv(sd, p + "4.weight")
        d["up_b"] = _np(sd[p + "4.bias"])
    elif kind == "down2":
        d["down_w"] = _conv(sd, p + "4.weight")
        d["down_b"] = _np(sd[p + "4.bias"])
    return d


def _rcu(sd, prefix, use_bn):
    d = dict(conv1_w=_conv(sd, prefix + ".conv1.weight"),
             conv2_w=_conv(sd, prefix + ".conv2.weight"))
    if use_bn:
        d["bn1"] = _bn(sd, prefix + ".bn1")
        d["bn2"] = _bn(sd, prefix + ".bn2")
    else:
        d["conv1_b"] = _np(sd[prefix + ".conv1.bias"])
        d["conv2_b"] = _np(sd[prefix + ".conv2.bias"])
    return d


def _fusion(sd, n, use_bn):
    p = f"scratch.refinenet{n}"
    return dict(rcu1=_rcu(sd, p + ".resConfUnit1", use_bn),
                rcu2=_rcu(sd, p + ".resConfUnit2", use_bn),
                out_w=_conv(sd, p + ".out_conv.weight"),
                out_b=_np(sd[p + ".out_conv.bias"]))


def convert_state_dict(sd: dict, cfg: DPTConfig) -> dict:
    """Map an official DPT state dict into the dpt.py param pytree."""
    bb = dict(
        cls_token=_np(sd["pretrained.model.cls_token"]),
        pos_embed=_np(sd["pretrained.model.pos_embed"]),
        blocks=[_vit_block(sd, i) for i in range(cfg.vit_depth)],
        patch_w=_conv(sd, "pretrained.model.patch_embed.proj.weight"),
        patch_b=_np(sd["pretrained.model.patch_embed.proj.bias"]),
    )
    if cfg.hybrid:
        stem = "pretrained.model.patch_embed.backbone.stem."
        bb["stem"] = dict(conv_w=_conv(sd, stem + "conv.weight"),
                          norm_g=_np(sd[stem + "norm.weight"]),
                          norm_b=_np(sd[stem + "norm.bias"]))
        bb["stages"] = [_resnet_stage(sd, si, n)
                        for si, n in enumerate(cfg.rn_layers)]

    use_bn = cfg.use_bn
    scratch = dict(
        layer1_w=_conv(sd, "scratch.layer1_rn.weight"),
        layer2_w=_conv(sd, "scratch.layer2_rn.weight"),
        layer3_w=_conv(sd, "scratch.layer3_rn.weight"),
        layer4_w=_conv(sd, "scratch.layer4_rn.weight"),
        refinenet1=_fusion(sd, 1, use_bn), refinenet2=_fusion(sd, 2, use_bn),
        refinenet3=_fusion(sd, 3, use_bn), refinenet4=_fusion(sd, 4, use_bn),
    )

    if cfg.head == "depth":
        head = dict(conv1_w=_conv(sd, "scratch.output_conv.0.weight"),
                    conv1_b=_np(sd["scratch.output_conv.0.bias"]),
                    conv2_w=_conv(sd, "scratch.output_conv.2.weight"),
                    conv2_b=_np(sd["scratch.output_conv.2.bias"]),
                    conv3_w=_conv(sd, "scratch.output_conv.4.weight"),
                    conv3_b=_np(sd["scratch.output_conv.4.bias"]))
    else:
        head = dict(conv1_w=_conv(sd, "scratch.output_conv.0.weight"),
                    bn=_bn(sd, "scratch.output_conv.1"),
                    conv2_w=_conv(sd, "scratch.output_conv.4.weight"),
                    conv2_b=_np(sd["scratch.output_conv.4.bias"]))

    params = dict(backbone=bb, scratch=scratch, head=head,
                  post3=_post(sd, 3, "none"), post4=_post(sd, 4, "down2"))
    if not cfg.hybrid:
        params["post1"] = _post(sd, 1, "up4")
        params["post2"] = _post(sd, 2, "up2")
    return params


def load_torch(path: str, cfg: DPTConfig) -> dict:
    """Load an official .pt checkpoint (requires the baked-in CPU torch)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v for k, v in sd.items() if "attn_mask" not in k}
    return convert_state_dict(sd, cfg)
