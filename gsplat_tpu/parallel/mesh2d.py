"""Composed 2D (data x tile) mesh training: camera batch sharded over the
``data`` axis AND each camera's image sharded by tile rows over the ``tile``
axis — the BASELINE config-5 shape ("tiles AND cameras sharded").

Layout: a ``Mesh`` of shape (M, N).  Device (m, n) renders tile-row slice n
of camera m via the bit-exact ``pixel_offset`` crop path (the same
zero-communication tile property the CUDA rasterizer exploits per-block,
forward.cu:261-392 — see :mod:`gsplat_tpu.parallel.tile_parallel`).
Gaussian parameters are replicated everywhere; the per-camera loss is
computed on the row-sharded full image (GSPMD inserts the SSIM halo
exchanges over ICI), and the parameter VJP through ``shard_map`` is a psum
over BOTH axes — tile partials within a camera plus the camera mean — i.e.
the reference's atomicAdd (backward.cu:575-636) lifted across the whole
mesh.  The means2d gradient tap stays PER-CAMERA ([M, P, 2], psum over tile
only) because densification statistics need the sum of per-camera grad
NORMS, not the norm of the summed gradient (train.py:169-180 semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.core import transforms as T
from gsplat_tpu.models import adam
from gsplat_tpu.models.gaussians import GaussianParams
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
from gsplat_tpu.parallel.data_parallel import shard_map
from gsplat_tpu.parallel.tile_parallel import _slice_cfg
from gsplat_tpu.train import losses as L


def make_2d_mesh(data: int, tile: int) -> Mesh:
    devs = jax.devices()
    if data * tile > len(devs):
        raise ValueError(f"mesh {data}x{tile} needs {data * tile} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:data * tile]).reshape(data, tile),
                ("data", "tile"))


def make_2d_train_step(mesh: Mesh, cfg_full: RasterizeConfig, opt,
                       sh_degree: int, depth_loss_choice, use_seg: bool,
                       bg: jnp.ndarray, track_stats: bool = True,
                       use_appearance: bool = False, app_lr: float = 1e-4):
    """Jitted step(params, opt_state, aux, stacked_batch, lrs, key) over an
    (M, N) data x tile mesh; ``stacked_batch`` leaves have leading dim M.
    Semantics match ``data_parallel.make_parallel_train_step`` (mean loss
    over the M cameras, per-camera densify stats psum'd/pmax'd) composed
    with ``tile_parallel``'s bit-exact row slicing.

    With ``use_appearance`` (VERDICT r4 item 6) the step takes the 8-arg
    appearance form.  Per-camera RGB factors are computed once from the
    replicated app_params (vmap over the M cameras) and multiplied into
    each camera's row-sharded image; gradient semantics match
    data_parallel.make_parallel_appearance_step — embedding rows get their
    own full per-camera gradient (rows are disjoint, so the 1/M of the
    mean loss is scaled back out), shared MLP weights get mean-of-grads."""
    M = mesh.shape["data"]
    N = mesh.shape["tile"]
    H, W = cfg_full.height, cfg_full.width
    hs = H // N
    cfg = _slice_cfg(cfg_full, N)
    use_seg = use_seg and cfg.num_class > 0
    S = max(1, cfg.num_class)

    def device_fwd(means3d, scales, rotations, opacities, shs, segments,
                   m2d_off, viewmatrix, projmatrix, campos, tan_fovx,
                   tan_fovy):
        # this device's shard: camera index = its 'data' coordinate
        # (leading dim 1), tile-row slice = its 'tile' coordinate
        y0 = (jax.lax.axis_index("tile") * hs).astype(jnp.float32)
        out = rasterize(cfg, means3d, scales, rotations, opacities, shs,
                        viewmatrix=viewmatrix[0], projmatrix=projmatrix[0],
                        campos=campos[0], tan_fovx=tan_fovx[0],
                        tan_fovy=tan_fovy[0], bg=bg,
                        segments=segments if use_seg else None,
                        means2d_offset=m2d_off[0],
                        pixel_offset=(jnp.float32(0.0), y0))
        seg = (out["segment"][None] if use_seg
               else jnp.zeros((1, S, hs, W)))
        radii = jax.lax.pmax(out["radii"], "tile")[None]          # [1, P]
        vis = jax.lax.pmax(out["visibility"].astype(jnp.int32), "tile")[None]
        overflow = jax.lax.pmax(out["overflow"].astype(jnp.int32),
                                ("data", "tile"))
        nrend = jax.lax.pmax(out["num_rendered"], ("data", "tile"))
        return (out["render"][None], out["depth"][None], seg, radii,
                vis, overflow, nrend)

    rep = P()
    dshard = P("data")
    sharded_fwd = shard_map(
        device_fwd, mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, dshard,
                  dshard, dshard, dshard, dshard, dshard),
        out_specs=(P("data", None, "tile", None), P("data", "tile", None),
                   P("data", None, "tile", None), dshard, dshard, rep, rep),
    )

    def cam_loss(image, gt, depth, gt_depth, has_depth, seg, gt_seg,
                 has_seg, key):
        l1 = L.l1_loss(image, gt)
        loss = ((1.0 - opt.lambda_dssim) * l1
                + opt.lambda_dssim * (1.0 - L.ssim(image, gt)))
        depth_loss = jnp.float32(0.0)
        if depth_loss_choice is not None:
            d = depth / (jnp.max(depth) + 1e-5)
            dl = L.depth_loss_dispatch(depth_loss_choice, key, d,
                                       gt_depth, opt)
            depth_loss = jnp.where(has_depth, dl, 0.0)
            loss = loss + depth_loss
        seg_loss = jnp.float32(0.0)
        if use_seg:
            sl = L.segment_loss(seg, gt_seg) * opt.lambda_segment
            seg_loss = jnp.where(has_seg, sl, 0.0)
            loss = loss + seg_loss
        return loss, l1, depth_loss, seg_loss

    def loss_fn(params: GaussianParams, m2d_off, batch, key,
                app_params=None):
        segments = (T.segment_activation(params.segment) if use_seg else
                    jnp.zeros((params.xyz.shape[0], S)))
        img, depth, seg, radii, vis, overflow, nrend = sharded_fwd(
            params.xyz, T.scaling_activation(params.scaling),
            params.rotation, T.opacity_activation(params.opacity[:, 0]),
            jnp.concatenate([params.features_dc, params.features_rest],
                            axis=1),
            segments, m2d_off,
            batch["viewmatrix"], batch["projmatrix"], batch["campos"],
            batch["tan_fovx"], batch["tan_fovy"])
        if use_appearance and app_params is not None:
            from gsplat_tpu.models import appearance as app_lib
            factors = jax.vmap(
                lambda uid, vm: app_lib.apply(app_params, uid, vm))(
                batch["uid"], batch["viewmatrix"])        # [M, 3]
            img = img * factors[:, :, None, None]
        keys = jax.random.split(key, M)
        losses, l1s, dls, sls = jax.vmap(cam_loss)(
            img, batch["gt_image"], depth, batch["gt_depth"],
            batch["has_depth"], seg, batch["gt_seg"], batch["has_seg"],
            keys)
        auxout = {"l1": jnp.mean(l1s), "depth_loss": jnp.mean(dls),
                  "seg_loss": jnp.mean(sls), "radii": radii,
                  "visibility": vis.astype(bool), "overflow": overflow,
                  "num_rendered": nrend}
        return jnp.mean(losses), auxout

    def _update_stats(aux, g_m2d, radii):
        if not track_stats:
            return aux
        # per-camera stats summed over the M cameras, matching the
        # data_parallel psum/pmax semantics.  The mean loss carries a
        # 1/M into g_m2d; scale it back out so each camera contributes
        # its own full-gradient norm like the reference's
        # add_densification_stats does per step.
        scale = jnp.array([0.5 * cfg_full.width, 0.5 * cfg_full.height])
        gnorm = jnp.linalg.norm(g_m2d * M * scale[None, None, :],
                                axis=-1)                          # [M, P]
        vis = radii > 0
        return aux._replace(
            xyz_gradient_accum=aux.xyz_gradient_accum
            + jnp.sum(jnp.where(vis, gnorm, 0.0), axis=0),
            denom=aux.denom + jnp.sum(vis.astype(jnp.float32), axis=0),
            max_radii2d=jnp.maximum(
                aux.max_radii2d,
                jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                        axis=0)),
        )

    def _metrics(loss, auxout):
        return {
            "loss": loss, "l1": auxout["l1"],
            "depth_loss": auxout["depth_loss"],
            "seg_loss": auxout["seg_loss"],
            "overflow": auxout["overflow"],
            "num_rendered": auxout["num_rendered"],
            "n_visible": jnp.max(jnp.sum(
                auxout["visibility"].astype(jnp.int32), axis=1)),
        }

    def _lrs_tree(lrs):
        return GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})

    from gsplat_tpu.train.trainer import gate_on_overflow

    if use_appearance:
        @jax.jit
        def app_step(params, opt_state, aux, app_params, app_opt_state,
                     batch, lrs, key):
            old = (params, opt_state, aux, app_params, app_opt_state)
            Pn = params.xyz.shape[0]
            m2d_off = jnp.zeros((M, Pn, 2), jnp.float32)
            (loss, auxout), (gparams, g_m2d, g_app) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 4), has_aux=True)(
                params, m2d_off, batch, key, app_params)
            aux = _update_stats(aux, g_m2d, auxout["radii"])
            params, opt_state = adam.update(gparams, opt_state, params,
                                            _lrs_tree(lrs))
            # disjoint embedding rows take their full per-camera gradient
            # (scale the mean loss's 1/M back out); shared MLP weights keep
            # the mean — matching data_parallel's psum/pmean split
            g_app = g_app._replace(emb=g_app.emb * M)
            app_lrs = jax.tree_util.tree_map(lambda _: app_lr, app_params)
            app_params, app_opt_state = adam.update(
                g_app, app_opt_state, app_params, app_lrs)
            (params, opt_state, aux, app_params,
             app_opt_state) = gate_on_overflow(
                auxout["overflow"] > 0,
                (params, opt_state, aux, app_params, app_opt_state), old)
            return (params, opt_state, aux, app_params, app_opt_state,
                    _metrics(loss, auxout))

        return app_step

    @jax.jit
    def step(params, opt_state, aux, batch, lrs, key):
        old = (params, opt_state, aux)
        Pn = params.xyz.shape[0]
        m2d_off = jnp.zeros((M, Pn, 2), jnp.float32)
        (loss, auxout), (gparams, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_off, batch,
                                                   key)
        aux = _update_stats(aux, g_m2d, auxout["radii"])
        params, opt_state = adam.update(gparams, opt_state, params,
                                        _lrs_tree(lrs))
        params, opt_state, aux = gate_on_overflow(
            auxout["overflow"] > 0, (params, opt_state, aux), old)
        return params, opt_state, aux, _metrics(loss, auxout)

    return step
