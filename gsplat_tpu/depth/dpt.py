"""DPT (Dense Prediction Transformer) in pure JAX — TPU-native.

Architecture spec: the reference's vendored Intel DPT
(/root/reference/DPT/dpt/{vit.py,blocks.py,models.py}); re-implemented
functionally in NHWC for TPU (MXU convs/matmuls, fp32 params with optional
bf16 activations).  Supported backbones:

- ``vitl16_384``  (DPT-Large): ViT-L/16, hooks (5,11,17,23), reassemble to
  (256,512,1024,1024) channels at strides (4,8,16,32)   [vit.py:517-530]
- ``vitb16_384``:  ViT-B/16, hooks (2,5,8,11), (96,192,384,768)
- ``vitb_rn50_384`` (DPT-Hybrid, the reference default): ResNetV2-50 stem
  (stages 0-1 tapped directly) + ViT-B over the stride-16 feature map,
  hooks (0,1,8,11) → (256,512,768,768)                  [vit.py:351-494]

Decoder: per-hook readout-projection + reassemble convs, four 3x3 "scratch"
convs to 256 features, RefineNet fusion blocks with residual conv units and
align_corners=True bilinear x2 upsampling, then a monodepth head
(conv3x3 -> x2 up -> conv3x3 -> relu -> conv1x1 -> relu)
[models.py:96-106] or an ADE20k segmentation head [models.py:131-141].

Params are a nested dict pytree; load official torch checkpoints with
``gsplat_tpu.depth.weights.load_torch``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class DPTConfig:
    backbone: str = "vitb_rn50_384"
    features: int = 256                       # decoder width
    reassemble: Sequence[int] = (256, 512, 768, 768)
    hooks: Sequence[int] = (0, 1, 8, 11)
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    patch: int = 16
    hybrid: bool = False                      # ResNetV2 stem, taps stages 0/1
    rn_layers: Sequence[int] = (3, 4, 9)      # hybrid ResNetV2 blocks/stage
    head: str = "depth"                       # "depth" | "segmentation"
    num_classes: int = 150                    # segmentation head
    use_bn: bool = False                      # fusion-block batchnorm (seg)
    non_negative: bool = True


def dpt_config(model_type: str = "dpt_hybrid", head: str = "depth",
               num_classes: int = 150) -> DPTConfig:
    """Mirror of run_monodepth.py:38-96's model zoo (minus weights)."""
    base = dict(head=head, num_classes=num_classes,
                use_bn=(head == "segmentation"))
    if model_type in ("dpt_large", "vitl16_384"):
        return DPTConfig(backbone="vitl16_384", hooks=(5, 11, 17, 23),
                         reassemble=(256, 512, 1024, 1024), vit_dim=1024,
                         vit_depth=24, vit_heads=16, vit_mlp=4096, **base)
    if model_type in ("dpt_base", "vitb16_384"):
        return DPTConfig(backbone="vitb16_384", hooks=(2, 5, 8, 11),
                         reassemble=(96, 192, 384, 768), **base)
    if model_type in ("dpt_hybrid", "dpt_hybrid_kitti", "dpt_hybrid_nyu",
                      "vitb_rn50_384"):
        return DPTConfig(backbone="vitb_rn50_384", hybrid=True, **base)
    raise ValueError(f"unknown DPT model_type {model_type!r} "
                     "(use dpt_large | dpt_base | dpt_hybrid)")


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def conv2d(x, w, b=None, stride=1, padding="SAME"):
    """NHWC conv, w: HWIO."""
    s = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI)
    if b is not None:
        y = y + b
    return y


def conv2d_transpose(x, w, b=None, stride=2):
    """NHWC transpose conv with kernel==stride (the reassemble upsamplers
    are exact k=s de-convolutions, vit.py:270-281).  Each input pixel owns a
    disjoint k x k output block, so this is ONE einsum on the MXU:
    out[n, y*k+a, x*k+c, o] = sum_i x[n,y,x,i] * w[a,c,i,o].
    w layout: [k,k,in,out] (torch ConvTranspose2d [in,out,k,k] transposed
    (2,3,0,1) by the weight converter)."""
    n, h, ww, _ = x.shape
    k = w.shape[0]
    y = jnp.einsum("nhwi,abio->nhawbo", x, w, precision=_HI)
    y = y.reshape(n, h * k, ww * k, w.shape[-1])
    if b is not None:
        y = y + b
    return y


def _same_pad_amount(size: int, k: int, s: int):
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def std_conv_same(x, w, b=None, stride=1, eps=1e-8):
    """Weight-standardized conv with TF 'SAME' (possibly asymmetric) padding —
    timm StdConv2dSame, the hybrid ResNetV2 conv layer."""
    mu = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    w = (w - mu) / jnp.sqrt(var + eps)
    ph = _same_pad_amount(x.shape[1], w.shape[0], stride)
    pw = _same_pad_amount(x.shape[2], w.shape[1], stride)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=(ph, pw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI)
    if b is not None:
        y = y + b
    return y


def max_pool_same(x, k=3, stride=2):
    ph = _same_pad_amount(x.shape[1], k, stride)
    pw = _same_pad_amount(x.shape[2], k, stride)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        ((0, 0), ph, pw, (0, 0)))


def group_norm(x, gamma, beta, groups=32, eps=1e-5, act=True):
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) / jnp.sqrt(var + eps)
    y = xg.reshape(n, h, w, c) * gamma + beta
    return jax.nn.relu(y) if act else y


def layer_norm(x, gamma, beta, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma + beta


def batch_norm_inference(x, p, eps=1e-5):
    """Folded inference-mode BatchNorm2d (running stats)."""
    scale = p["gamma"] / jnp.sqrt(p["var"] + eps)
    return x * scale + (p["beta"] - p["mean"] * scale)


def resize_bilinear_ac(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True (torch F.interpolate in the
    fusion blocks and heads, blocks.py:240-242,384-386) — jax.image.resize is
    half-pixel only, so interpolate explicitly via gathers."""
    n, h, w, c = x.shape

    def weights(in_s, out_s):
        if out_s == 1 or in_s == 1:
            pos = jnp.zeros((out_s,), jnp.float32)
        else:
            pos = jnp.arange(out_s, dtype=jnp.float32) * (in_s - 1) / (out_s - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_s - 1)
        i1 = jnp.minimum(i0 + 1, in_s - 1)
        t = pos - i0.astype(jnp.float32)
        return i0, i1, t

    y0, y1, ty = weights(h, out_h)
    x0, x1, tx = weights(w, out_w)
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    ty = ty[None, :, None, None]
    tx = tx[None, None, :, None]
    top = a * (1 - tx) + b * tx
    bot = cc * (1 - tx) + d * tx
    return top * (1 - ty) + bot * ty


def gelu(x):
    return jax.nn.gelu(x, approximate=False)   # torch nn.GELU is exact erf


# --------------------------------------------------------------------------
# ViT backbone (timm vision_transformer semantics)
# --------------------------------------------------------------------------

def _attention(p, x, heads: int):
    n, t, c = x.shape
    qkv = x @ p["qkv_w"] + p["qkv_b"]                       # [N,T,3C]
    qkv = qkv.reshape(n, t, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]      # [N,T,H,D]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    att = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                     precision=_HI) * (1.0 / math.sqrt(c // heads))
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", att, v, precision=_HI)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, c)
    return out @ p["proj_w"] + p["proj_b"]


def _vit_block(p, x, heads: int):
    x = x + _attention(p["attn"],
                       layer_norm(x, p["norm1_g"], p["norm1_b"]), heads)
    h = layer_norm(x, p["norm2_g"], p["norm2_b"])
    h = gelu(h @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]
    return x + h


def resize_pos_embed(pos, gs_h: int, gs_w: int):
    """vit.py:148-163 — bilinear (half-pixel, align_corners=False) resize of
    the grid part; the cls token row is kept."""
    tok, grid = pos[:, :1], pos[0, 1:]
    gs_old = int(round(math.sqrt(grid.shape[0])))
    grid = grid.reshape(1, gs_old, gs_old, -1)
    grid = jax.image.resize(grid, (1, gs_h, gs_w, grid.shape[-1]), "bilinear")
    return jnp.concatenate([tok, grid.reshape(1, gs_h * gs_w, -1)], axis=1)


def _resnet_stage(p, x, si: int):
    for bi, blk in enumerate(p["blocks"]):
        stride = 2 if (bi == 0 and si > 0) else 1
        if "downsample" in blk:
            sc = std_conv_same(x, blk["downsample"]["conv_w"], stride=stride)
            sc = group_norm(sc, blk["downsample"]["norm_g"],
                            blk["downsample"]["norm_b"], act=False)
        else:
            sc = x
        h = std_conv_same(x, blk["conv1_w"])
        h = group_norm(h, blk["norm1_g"], blk["norm1_b"])
        h = std_conv_same(h, blk["conv2_w"], stride=stride)
        h = group_norm(h, blk["norm2_g"], blk["norm2_b"])
        h = std_conv_same(h, blk["conv3_w"])
        h = group_norm(h, blk["norm3_g"], blk["norm3_b"], act=False)
        x = jax.nn.relu(h + sc)
    return x


def vit_forward(p, cfg: DPTConfig, x):
    """x: [N,H,W,3] (H,W multiples of 32). Returns the 4 hooked activations:
    token sequences [N,T,C] for transformer hooks, NHWC maps for ResNet taps
    (forward_flex vit.py:166-201 + the hook mechanism vit.py:351-380)."""
    n, H, W, _ = x.shape
    taps = {}
    if cfg.hybrid:
        h = std_conv_same(x, p["stem"]["conv_w"], stride=2)
        h = group_norm(h, p["stem"]["norm_g"], p["stem"]["norm_b"])
        h = max_pool_same(h)
        h = _resnet_stage(p["stages"][0], h, 0)
        taps[0] = h                                   # stride 4, 256ch
        h = _resnet_stage(p["stages"][1], h, 1)
        taps[1] = h                                   # stride 8, 512ch
        h = _resnet_stage(p["stages"][2], h, 2)       # stride 16, 1024ch
        tokens = conv2d(h, p["patch_w"], p["patch_b"], padding="VALID")
    else:
        tokens = conv2d(x, p["patch_w"], p["patch_b"],
                        stride=cfg.patch, padding="VALID")
    gh, gw = tokens.shape[1], tokens.shape[2]
    tokens = tokens.reshape(n, gh * gw, -1)
    cls = jnp.broadcast_to(p["cls_token"], (n, 1, tokens.shape[-1]))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + resize_pos_embed(p["pos_embed"], gh, gw)
    for i, blk in enumerate(p["blocks"]):
        tokens = _vit_block(blk, tokens, cfg.vit_heads)
        if i in cfg.hooks[2:] or (not cfg.hybrid and i in cfg.hooks):
            taps[i] = tokens
    layers = [taps[hk] for hk in cfg.hooks] if not cfg.hybrid else \
        [taps[0], taps[1], taps[cfg.hooks[2]], taps[cfg.hooks[3]]]
    return layers, (gh, gw)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _readout_project(p, tokens):
    """'project' readout (vit.py:79-90): concat cls to every patch token,
    linear 2C->C + GELU."""
    cls = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
    f = jnp.concatenate([tokens[:, 1:], cls], axis=-1)
    return gelu(f @ p["w"] + p["b"])


def _reassemble(p, tokens, grid, kind: str):
    """act_postprocess (vit.py:259-337): readout -> unflatten -> 1x1 conv
    [-> resample]."""
    gh, gw = grid
    f = _readout_project(p["readout"], tokens)
    f = f.reshape(f.shape[0], gh, gw, f.shape[-1])
    f = conv2d(f, p["conv_w"], p["conv_b"], padding="VALID")
    if kind == "up4":
        f = conv2d_transpose(f, p["up_w"], p["up_b"], stride=4)
    elif kind == "up2":
        f = conv2d_transpose(f, p["up_w"], p["up_b"], stride=2)
    elif kind == "down2":
        f = conv2d(f, p["down_w"], p["down_b"], stride=2, padding=((1, 1), (1, 1)))
    return f


def _res_conv_unit(p, x, use_bn: bool):
    h = jax.nn.relu(x)
    h = conv2d(h, p["conv1_w"], p.get("conv1_b"), padding=((1, 1), (1, 1)))
    if use_bn:
        h = batch_norm_inference(h, p["bn1"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2_w"], p.get("conv2_b"), padding=((1, 1), (1, 1)))
    if use_bn:
        h = batch_norm_inference(h, p["bn2"])
    return h + x


def _fusion(p, x, skip, use_bn: bool):
    """FeatureFusionBlock_custom (blocks.py:326-383)."""
    if skip is not None:
        x = x + _res_conv_unit(p["rcu1"], skip, use_bn)
    x = _res_conv_unit(p["rcu2"], x, use_bn)
    x = resize_bilinear_ac(x, x.shape[1] * 2, x.shape[2] * 2)
    return conv2d(x, p["out_w"], p["out_b"], padding="VALID")


def dpt_forward(params, cfg: DPTConfig, x):
    """x: [N,H,W,3] normalized. Returns [N,H,W] inverse depth (head='depth')
    or [N,H,W,num_classes] logits (head='segmentation')."""
    layers, grid = vit_forward(params["backbone"], cfg, x)

    if cfg.hybrid:
        l1, l2 = layers[0], layers[1]
        l3 = _reassemble(params["post3"], layers[2], grid, "none")
        l4 = _reassemble(params["post4"], layers[3], grid, "down2")
    else:
        l1 = _reassemble(params["post1"], layers[0], grid, "up4")
        l2 = _reassemble(params["post2"], layers[1], grid, "up2")
        l3 = _reassemble(params["post3"], layers[2], grid, "none")
        l4 = _reassemble(params["post4"], layers[3], grid, "down2")

    sc = params["scratch"]
    r1 = conv2d(l1, sc["layer1_w"], padding=((1, 1), (1, 1)))
    r2 = conv2d(l2, sc["layer2_w"], padding=((1, 1), (1, 1)))
    r3 = conv2d(l3, sc["layer3_w"], padding=((1, 1), (1, 1)))
    r4 = conv2d(l4, sc["layer4_w"], padding=((1, 1), (1, 1)))

    p4 = _fusion(sc["refinenet4"], r4, None, cfg.use_bn)
    p3 = _fusion(sc["refinenet3"], p4, r3, cfg.use_bn)
    p2 = _fusion(sc["refinenet2"], p3, r2, cfg.use_bn)
    p1 = _fusion(sc["refinenet1"], p2, r1, cfg.use_bn)

    h = params["head"]
    if cfg.head == "depth":
        y = conv2d(p1, h["conv1_w"], h["conv1_b"], padding=((1, 1), (1, 1)))
        y = resize_bilinear_ac(y, y.shape[1] * 2, y.shape[2] * 2)
        y = jax.nn.relu(conv2d(y, h["conv2_w"], h["conv2_b"],
                               padding=((1, 1), (1, 1))))
        y = conv2d(y, h["conv3_w"], h["conv3_b"], padding="VALID")
        if cfg.non_negative:
            y = jax.nn.relu(y)
        return y[..., 0]
    # segmentation head (models.py:131-141): conv3x3(no bias)+BN+ReLU ->
    # conv1x1 -> x2 bilinear upsample
    y = conv2d(p1, h["conv1_w"], padding=((1, 1), (1, 1)))
    y = jax.nn.relu(batch_norm_inference(y, h["bn"]))
    y = conv2d(y, h["conv2_w"], h["conv2_b"], padding="VALID")
    return resize_bilinear_ac(y, y.shape[1] * 2, y.shape[2] * 2)


# --------------------------------------------------------------------------
# init (random weights — weight loading lives in weights.py)
# --------------------------------------------------------------------------

def _rand(key, *shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def init_params(rng, cfg: DPTConfig, grid: int = 24):
    """Random-init param pytree with the exact shapes of the torch
    checkpoints (for tests and shape documentation)."""
    keys = iter(jax.random.split(rng, 4096))
    C, F = cfg.vit_dim, cfg.features

    def block():
        return dict(
            norm1_g=jnp.ones(C), norm1_b=jnp.zeros(C),
            attn=dict(qkv_w=_rand(next(keys), C, 3 * C),
                      qkv_b=jnp.zeros(3 * C),
                      proj_w=_rand(next(keys), C, C), proj_b=jnp.zeros(C)),
            norm2_g=jnp.ones(C), norm2_b=jnp.zeros(C),
            fc1_w=_rand(next(keys), C, cfg.vit_mlp), fc1_b=jnp.zeros(cfg.vit_mlp),
            fc2_w=_rand(next(keys), cfg.vit_mlp, C), fc2_b=jnp.zeros(C),
        )

    backbone = dict(
        cls_token=_rand(next(keys), 1, 1, C),
        pos_embed=_rand(next(keys), 1, grid * grid + 1, C),
        blocks=[block() for _ in range(cfg.vit_depth)],
    )
    if cfg.hybrid:
        backbone["stem"] = dict(conv_w=_rand(next(keys), 7, 7, 3, 64),
                                norm_g=jnp.ones(64), norm_b=jnp.zeros(64))
        stages = []
        cin, width = 64, 64
        for si, nblk in enumerate(cfg.rn_layers):
            blocks = []
            cout = width * 4
            for bi in range(nblk):
                stride = 2 if (bi == 0 and si > 0) else 1
                b = dict(
                    conv1_w=_rand(next(keys), 1, 1, cin, width),
                    norm1_g=jnp.ones(width), norm1_b=jnp.zeros(width),
                    conv2_w=_rand(next(keys), 3, 3, width, width),
                    norm2_g=jnp.ones(width), norm2_b=jnp.zeros(width),
                    conv3_w=_rand(next(keys), 1, 1, width, cout),
                    norm3_g=jnp.ones(cout), norm3_b=jnp.zeros(cout),
                )
                if bi == 0:
                    b["downsample"] = dict(
                        conv_w=_rand(next(keys), 1, 1, cin, cout),
                        norm_g=jnp.ones(cout), norm_b=jnp.zeros(cout))
                blocks.append(b)
                cin = cout
            stages.append(dict(blocks=blocks))
            width *= 2
        backbone["stages"] = stages
        backbone["patch_w"] = _rand(next(keys), 1, 1, 1024, C)
        backbone["patch_b"] = jnp.zeros(C)
    else:
        backbone["patch_w"] = _rand(next(keys), cfg.patch, cfg.patch, 3, C)
        backbone["patch_b"] = jnp.zeros(C)

    def post(cout, kind):
        p = dict(readout=dict(w=_rand(next(keys), 2 * C, C), b=jnp.zeros(C)),
                 conv_w=_rand(next(keys), 1, 1, C, cout),
                 conv_b=jnp.zeros(cout))
        if kind in ("up4", "up2"):
            k = 4 if kind == "up4" else 2
            p["up_w"] = _rand(next(keys), k, k, cout, cout)
            p["up_b"] = jnp.zeros(cout)
        elif kind == "down2":
            p["down_w"] = _rand(next(keys), 3, 3, cout, cout)
            p["down_b"] = jnp.zeros(cout)
        return p

    def rcu():
        d = dict(conv1_w=_rand(next(keys), 3, 3, F, F),
                 conv2_w=_rand(next(keys), 3, 3, F, F))
        if cfg.use_bn:
            for i in (1, 2):
                d[f"bn{i}"] = dict(gamma=jnp.ones(F), beta=jnp.zeros(F),
                                   mean=jnp.zeros(F), var=jnp.ones(F))
        else:
            d["conv1_b"] = jnp.zeros(F)
            d["conv2_b"] = jnp.zeros(F)
        return d

    def fusion():
        return dict(rcu1=rcu(), rcu2=rcu(),
                    out_w=_rand(next(keys), 1, 1, F, F), out_b=jnp.zeros(F))

    ra = cfg.reassemble
    scratch = dict(
        layer1_w=_rand(next(keys), 3, 3, ra[0], F),
        layer2_w=_rand(next(keys), 3, 3, ra[1], F),
        layer3_w=_rand(next(keys), 3, 3, ra[2], F),
        layer4_w=_rand(next(keys), 3, 3, ra[3], F),
        refinenet1=fusion(), refinenet2=fusion(),
        refinenet3=fusion(), refinenet4=fusion(),
    )

    if cfg.head == "depth":
        head = dict(conv1_w=_rand(next(keys), 3, 3, F, F // 2),
                    conv1_b=jnp.zeros(F // 2),
                    conv2_w=_rand(next(keys), 3, 3, F // 2, 32),
                    conv2_b=jnp.zeros(32),
                    conv3_w=_rand(next(keys), 1, 1, 32, 1),
                    conv3_b=jnp.zeros(1))
    else:
        head = dict(conv1_w=_rand(next(keys), 3, 3, F, F),
                    bn=dict(gamma=jnp.ones(F), beta=jnp.zeros(F),
                            mean=jnp.zeros(F), var=jnp.ones(F)),
                    conv2_w=_rand(next(keys), 1, 1, F, cfg.num_classes),
                    conv2_b=jnp.zeros(cfg.num_classes))

    params = dict(backbone=backbone, scratch=scratch, head=head,
                  post3=post(ra[2], "none"), post4=post(ra[3], "down2"))
    if not cfg.hybrid:
        params["post1"] = post(ra[0], "up4")
        params["post2"] = post(ra[1], "up2")
    return params
