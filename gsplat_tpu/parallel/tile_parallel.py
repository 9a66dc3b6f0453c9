"""Tile-sharded (spatial-parallel) rendering AND training: one large image
split across chips by tile rows.

SURVEY.md §2.3: "shard the 16x16 tile grid of one large image across chips;
per-tile composite is embarrassingly parallel after binning"
(forward.cu:261-392 has zero inter-tile communication).  TPU-native
realization WITHOUT touching the kernels: every device runs the identical
static-shape rasterize() program for a horizontal slice, rendered in
FULL-IMAGE pixel space via the ``pixel_offset`` crop path
(ops/preprocess.py) — focal, ndc2pix, EWA clamps and tile rects all use the
full camera, then pixel coordinates shift by the device's (exact, fp32)
tile-row offset.  The slice survivor sets and all per-instance attributes are
therefore BIT-IDENTICAL to the full render restricted to the slice: slices
composite to exactly the single-device image.

Training: the loss is computed on the row-sharded full image (XLA/GSPMD
inserts halo exchanges for the SSIM window across slice boundaries) and
``jax.grad`` differentiates through ``shard_map`` — the VJP of the
replicated parameter inputs is a psum of the per-slice backward-composite
gradients over ICI, the reference's atomicAdd (backward.cu:575-636) across
the chip dimension.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.parallel.data_parallel import shard_map
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize


def make_tile_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("tile",))


def _slice_cfg(cfg_full: RasterizeConfig, D: int) -> RasterizeConfig:
    from gsplat_tpu.ops.preprocess import TILE_Y
    H, W = cfg_full.height, cfg_full.width
    assert H % (TILE_Y * D) == 0, \
        "height must split into whole tile rows per device"
    hs = H // D
    return RasterizeConfig(
        width=W, height=hs, sh_degree=cfg_full.sh_degree,
        num_class=cfg_full.num_class,
        max_instances=cfg_full.max_instances, k_max=cfg_full.k_max,
        tile_batch=cfg_full.tile_batch, backend=cfg_full.backend,
        grad_precision=cfg_full.grad_precision, cull=cfg_full.cull,
        max_rows=cfg_full.max_rows, full_width=W, full_height=H)


def make_tile_sharded_render(mesh: Mesh, cfg_full: RasterizeConfig):
    """Returns render(means3d, scales, rotations, opacities, shs, camera
    dict, bg) -> dict with the full [3, H, W] image, computed
    slice-per-device and exactly equal to the single-device render.

    ``camera`` is the ordinary full-camera dict (viewmatrix, projmatrix,
    campos, tan_fovx, tan_fovy); no per-slice matrices needed.
    """
    D = mesh.shape["tile"]
    H, W = cfg_full.height, cfg_full.width
    hs = H // D
    cfg = _slice_cfg(cfg_full, D)

    def device_render(means3d, scales, rotations, opacities, shs,
                      viewmatrix, projmatrix, campos, tan_fovx, tan_fovy,
                      bg):
        y0 = (jax.lax.axis_index("tile") * hs).astype(jnp.float32)
        out = rasterize(cfg, means3d, scales, rotations, opacities, shs,
                        viewmatrix=viewmatrix, projmatrix=projmatrix,
                        campos=campos, tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                        bg=bg, pixel_offset=(jnp.float32(0.0), y0))
        radii = jax.lax.pmax(out["radii"], "tile")
        vis = jax.lax.pmax(out["visibility"].astype(jnp.int32), "tile")
        overflow = jax.lax.pmax(out["overflow"].astype(jnp.int32), "tile")
        return (out["render"][None], out["depth"][None], out["alpha"][None],
                radii, vis.astype(bool), overflow.astype(bool))

    rep = P()
    fn = shard_map(
        device_render, mesh,
        in_specs=(rep,) * 11,
        out_specs=(P(None, None, "tile", None), P(None, "tile", None),
                   P(None, "tile", None), rep, rep, rep),
    )

    @jax.jit
    def render_full(means3d, scales, rotations, opacities, shs, camera, bg):
        img, depth, alpha, radii, vis, overflow = fn(
            means3d, scales, rotations, opacities, shs,
            camera["viewmatrix"], camera["projmatrix"], camera["campos"],
            camera["tan_fovx"], camera["tan_fovy"], bg)
        return {
            "render": img.reshape(3, H, W),
            "depth": depth.reshape(H, W),
            "alpha": alpha.reshape(H, W),
            "radii": radii,
            "visibility": vis,
            "overflow": overflow,
        }

    return render_full


def slice_camera(cam, n_devices: int) -> dict:
    """Host helper: the camera dict for tile-sharded rendering (the plain
    full camera — slicing happens via in-kernel pixel offsets)."""
    return {
        "viewmatrix": jnp.asarray(cam.world_view_transform),
        "projmatrix": jnp.asarray(cam.full_proj_transform),
        "campos": jnp.asarray(cam.camera_center),
        "tan_fovx": jnp.float32(cam.tan_fovx),
        "tan_fovy": jnp.float32(cam.tan_fovy),
    }


def make_tile_sharded_train_step(mesh: Mesh, cfg_full: RasterizeConfig, opt,
                                 sh_degree: int, depth_loss_choice,
                                 use_seg: bool, bg: jnp.ndarray,
                                 use_appearance: bool = False,
                                 app_lr: float = 1e-4):
    """Full training step for ONE large camera sharded by tile rows across
    the mesh: forward slice-per-device, loss on the row-sharded full image,
    backward through shard_map (per-gaussian grads psum over ICI), Adam
    update, densification stats — gradient-identical to the single-device
    full-image step (see tests/test_tile_parallel.py).

    Signature matches train.trainer.make_train_step's step:
    step(params, opt_state, aux, batch, lrs, key) — or, with
    ``use_appearance``, make_appearance_step's 8-arg form.

    Appearance composition (VERDICT r4 item 6): the per-camera RGB factors
    depend only on the replicated app_params + camera (reference
    gaussian_renderer/__init__.py:112-199), so they are computed ONCE
    outside shard_map and multiplied into the row-sharded full image; their
    gradient flows through plain XLA ops (GSPMD reduces the row-sharded
    image-grad contractions over ICI) and equals the single-device
    full-image gradient exactly.
    """
    from gsplat_tpu.core import transforms as T
    from gsplat_tpu.models import adam
    from gsplat_tpu.models.densify import add_densification_stats
    from gsplat_tpu.models.gaussians import GaussianParams
    from gsplat_tpu.train import losses as L
    from gsplat_tpu.train.trainer import gate_on_overflow

    D = mesh.shape["tile"]
    H, W = cfg_full.height, cfg_full.width
    hs = H // D
    cfg = _slice_cfg(cfg_full, D)
    use_seg = use_seg and cfg.num_class > 0

    def device_fwd(means3d, scales, rotations, opacities, shs, segments,
                   m2d_off, viewmatrix, projmatrix, campos, tan_fovx,
                   tan_fovy):
        y0 = (jax.lax.axis_index("tile") * hs).astype(jnp.float32)
        out = rasterize(cfg, means3d, scales, rotations, opacities, shs,
                        viewmatrix=viewmatrix, projmatrix=projmatrix,
                        campos=campos, tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                        bg=bg, segments=segments if use_seg else None,
                        means2d_offset=m2d_off,
                        pixel_offset=(jnp.float32(0.0), y0))
        seg = (out["segment"][None] if use_seg
               else jnp.zeros((1, 1, hs, W)))
        radii = jax.lax.pmax(out["radii"], "tile")
        vis = jax.lax.pmax(out["visibility"].astype(jnp.int32), "tile")
        overflow = jax.lax.pmax(out["overflow"].astype(jnp.int32), "tile")
        nrend = jax.lax.pmax(out["num_rendered"], "tile")
        return (out["render"][None], out["depth"][None], seg, radii,
                vis, overflow, nrend)

    rep = P()
    sharded_fwd = shard_map(
        device_fwd, mesh,
        in_specs=(rep,) * 12,
        out_specs=(P(None, None, "tile", None), P(None, "tile", None),
                   P(None, None, "tile", None), rep, rep, rep, rep),
    )

    def loss_fn(params: GaussianParams, m2d_off, batch, key,
                app_params=None):
        segments = (T.segment_activation(params.segment) if use_seg else
                    jnp.zeros((params.xyz.shape[0], max(1, cfg.num_class))))
        img_s, depth_s, seg_s, radii, vis, overflow, nrend = sharded_fwd(
            params.xyz, T.scaling_activation(params.scaling),
            params.rotation, T.opacity_activation(params.opacity[:, 0]),
            jnp.concatenate([params.features_dc, params.features_rest],
                            axis=1),
            segments, m2d_off,
            batch["viewmatrix"], batch["projmatrix"], batch["campos"],
            batch["tan_fovx"], batch["tan_fovy"])
        image = img_s.reshape(3, H, W)
        if use_appearance and app_params is not None:
            from gsplat_tpu.models import appearance as app_lib
            factors = app_lib.apply(app_params, batch["uid"],
                                    batch["viewmatrix"])
            image = image * factors.reshape(3, 1, 1)
        gt = batch["gt_image"]
        l1 = L.l1_loss(image, gt)
        loss = ((1.0 - opt.lambda_dssim) * l1
                + opt.lambda_dssim * (1.0 - L.ssim(image, gt)))
        depth_loss = jnp.float32(0.0)
        if depth_loss_choice is not None:
            depth = depth_s.reshape(H, W)
            depth = depth / (jnp.max(depth) + 1e-5)
            dl = L.depth_loss_dispatch(depth_loss_choice, key, depth,
                                       batch["gt_depth"], opt)
            depth_loss = jnp.where(batch["has_depth"], dl, 0.0)
            loss = loss + depth_loss
        seg_loss = jnp.float32(0.0)
        if use_seg:
            sl = L.segment_loss(seg_s.reshape(cfg.num_class, H, W),
                                batch["gt_seg"]) * opt.lambda_segment
            seg_loss = jnp.where(batch["has_seg"], sl, 0.0)
            loss = loss + seg_loss
        auxout = {"l1": l1, "depth_loss": depth_loss, "seg_loss": seg_loss,
                  "radii": radii, "visibility": vis.astype(bool),
                  "overflow": overflow, "num_rendered": nrend}
        return loss, auxout

    def _metrics(loss, auxout):
        return {
            "loss": loss, "l1": auxout["l1"],
            "depth_loss": auxout["depth_loss"],
            "seg_loss": auxout["seg_loss"],
            "overflow": auxout["overflow"],
            "num_rendered": auxout["num_rendered"],
            "n_visible": jnp.sum(auxout["visibility"]),
        }

    def _lrs_tree(lrs):
        return GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})

    if use_appearance:
        @jax.jit
        def app_step(params, opt_state, aux, app_params, app_opt_state,
                     batch, lrs, key):
            old = (params, opt_state, aux, app_params, app_opt_state)
            Pn = params.xyz.shape[0]
            m2d_off = jnp.zeros((Pn, 2), jnp.float32)
            (loss, auxout), (gparams, g_m2d, g_app) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 4), has_aux=True)(
                params, m2d_off, batch, key, app_params)
            scale = jnp.array([0.5 * W, 0.5 * H])
            aux = add_densification_stats(aux, g_m2d * scale[None, :],
                                          auxout["radii"])
            params, opt_state = adam.update(gparams, opt_state, params,
                                            _lrs_tree(lrs))
            app_lrs = jax.tree_util.tree_map(lambda _: app_lr, app_params)
            app_params, app_opt_state = adam.update(
                g_app, app_opt_state, app_params, app_lrs)
            (params, opt_state, aux, app_params,
             app_opt_state) = gate_on_overflow(
                auxout["overflow"] > 0,
                (params, opt_state, aux, app_params, app_opt_state), old)
            return (params, opt_state, aux, app_params, app_opt_state,
                    _metrics(loss, auxout))

        return app_step, loss_fn

    @jax.jit
    def step(params, opt_state, aux, batch, lrs, key):
        old = (params, opt_state, aux)
        Pn = params.xyz.shape[0]
        m2d_off = jnp.zeros((Pn, 2), jnp.float32)
        (loss, auxout), (gparams, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_off, batch,
                                                   key)
        scale = jnp.array([0.5 * W, 0.5 * H])
        aux = add_densification_stats(aux, g_m2d * scale[None, :],
                                      auxout["radii"])
        params, opt_state = adam.update(gparams, opt_state, params,
                                        _lrs_tree(lrs))
        params, opt_state, aux = gate_on_overflow(
            auxout["overflow"] > 0, (params, opt_state, aux), old)
        return params, opt_state, aux, _metrics(loss, auxout)

    return step, loss_fn
