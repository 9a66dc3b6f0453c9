"""TPU-native monocular depth / segmentation estimation (DPT).

JAX re-implementation of the reference's vendored Intel DPT subproject
(/root/reference/DPT — SURVEY.md §2.2 P23): ViT backbones, reassemble +
RefineNet-style fusion decoder, monodepth and ADE20k segmentation heads.
Weights load from the official torch checkpoints via ``weights.load_torch``.
"""
from gsplat_tpu.depth.dpt import (  # noqa: F401
    DPTConfig, dpt_config, init_params, dpt_forward,
)
