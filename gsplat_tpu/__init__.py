"""gsplat_tpu — TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/Pallas/pjit re-design of the capabilities of the reference
``Crush1111/3d_gaussian_magic_change-segment_3DGS`` fork (Inria 3DGS + depth
rendering, monocular-depth supervision, per-gaussian segmentation, scene
editing tooling).  The compute path is pure JAX + Pallas TPU kernels; there is
no torch and no CUDA anywhere in this package.

Layer map (mirrors SURVEY.md §1 for the reference):

- ``core``     : camera/projection/SH/covariance math (reference: forward.cu:74-152,
                 utils/graphics_utils.py, utils/sh_utils.py)
- ``ops``      : the differentiable tile rasterizer — preprocess, binning,
                 composite (reference: cuda_rasterizer/*.cu) and the KNN init
                 (reference: simple-knn)
- ``models``   : gaussian parameter state + densification (reference:
                 scene/gaussian_model.py), appearance embedding, pose optimizer
- ``data``     : COLMAP / Blender / NeRFstudio readers, PLY IO, Scene
                 (reference: scene/)
- ``train``    : losses, schedules, the training step/loop (reference:
                 train.py, train_segment.py, utils/loss_utils.py)
- ``parallel`` : device-mesh sharding of cameras/tiles + gradient psum
                 (new; the reference is single-GPU)
- ``scripts``  : CLI entry points (train / train_segment / render / metrics /
                 full_eval / visualize)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GSPLAT_PLATFORM"):
    # Force the JAX platform for script subprocesses (e.g. CPU smoke runs
    # of the CLI while the TPU is busy).  The axon sitecustomize selects
    # jax_platforms="axon,cpu" via jax.config, which OUTRANKS the
    # JAX_PLATFORMS env var — only another config.update can override it.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GSPLAT_PLATFORM"])

from gsplat_tpu.core.cameras import Camera, MiniCam  # noqa: F401
