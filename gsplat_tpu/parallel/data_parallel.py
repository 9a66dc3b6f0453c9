"""Multi-chip camera-batch data parallelism.

The reference is strictly single-GPU (SURVEY.md §2.3); this module adds the
TPU-native scaling axis: a ``Mesh`` over the ``data`` dimension, one training
camera per chip per step, gaussian parameters REPLICATED, per-gaussian
gradients all-reduced with ``psum``/``pmean`` over ICI inside ``shard_map``
(XLA overlaps the collective with the backward composite).  Densification
statistics reduce the same way: gradients-norm sums via psum, screen-radius
maxima via pmax — replacing the reference's single-camera accumulation
(train.py:169-180) with a batched equivalent.

Reachable from the product: ``python -m gsplat_tpu.scripts.train
--data_parallel N`` (N=-1 for all local devices) puts the Trainer in mesh
mode — N cameras per step, densification/opacity-reset run on the replicated
state at the same host-side boundaries as single-chip training.

Multi-host: `jax.distributed.initialize()` + a global mesh makes the same
code span hosts (DCN between hosts, ICI within) — see
:mod:`gsplat_tpu.parallel.multihost`.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8 new api
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: the Pallas composite/binning host glue mixes
        # mesh-varying operands (per-camera instances) with unvarying index
        # constants in dynamic slices, which the varying-mesh-axis checker
        # rejects (its own error message suggests this workaround).  The
        # collectives' numerics are covered by the single-device equality
        # tests (test_parallel/test_tile_parallel/test_mesh2d).
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from gsplat_tpu.models import adam
from gsplat_tpu.models.gaussians import GaussianParams
from gsplat_tpu.ops.rasterize import RasterizeConfig
from gsplat_tpu.train.trainer import make_loss_fn


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


def stack_camera_batches(batches: list) -> dict:
    """Stack per-camera batches along a leading 'data' axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_parallel_train_step(mesh: Mesh, cfg: RasterizeConfig, opt,
                             sh_degree: int, depth_loss_choice, use_seg: bool,
                             bg: jnp.ndarray, track_stats: bool = True):
    """Returns a jitted step(params, opt_state, aux, stacked_batch, lrs, key).

    stacked_batch leaves have leading dim == mesh 'data' size; params /
    optimizer / aux are replicated.  Per-device: render own camera -> local
    grads; pmean over ICI; identical replicated Adam update on every chip.
    """
    loss_fn = make_loss_fn(cfg, opt, sh_degree, depth_loss_choice, use_seg, bg)

    def device_step(params, opt_state, aux, batch, lrs, key):
        old = (params, opt_state, aux)
        # local shard: leading dim 1
        b = jax.tree_util.tree_map(lambda x: x[0], batch)
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        Pn = params.xyz.shape[0]
        m2d_off = jnp.zeros((Pn, 2), jnp.float32)
        (loss, auxout), (gparams, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_off, b, key)

        # gradient all-reduce over ICI (the reference's atomicAdd analogue
        # across the chip dimension, SURVEY.md §2.3)
        gparams = jax.lax.pmean(gparams, "data")
        loss = jax.lax.pmean(loss, "data")

        if track_stats:
            scale = jnp.array([0.5 * cfg.width, 0.5 * cfg.height])
            gnorm = jnp.linalg.norm(g_m2d * scale[None, :], axis=-1)
            vis = auxout["radii"] > 0
            aux = aux._replace(
                xyz_gradient_accum=aux.xyz_gradient_accum + jax.lax.psum(
                    jnp.where(vis, gnorm, 0.0), "data"),
                denom=aux.denom + jax.lax.psum(
                    vis.astype(jnp.float32), "data"),
                max_radii2d=jax.lax.pmax(
                    jnp.where(vis, jnp.maximum(
                        aux.max_radii2d,
                        auxout["radii"].astype(jnp.float32)),
                        aux.max_radii2d), "data"),
            )

        lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
        params, opt_state = adam.update(gparams, opt_state, params, lrs_tree)
        ovf_any = jax.lax.pmax(auxout["overflow"].astype(jnp.int32), "data")
        from gsplat_tpu.train.trainer import gate_on_overflow
        params, opt_state, aux = gate_on_overflow(
            ovf_any > 0, (params, opt_state, aux), old)
        metrics = {
            "loss": loss, "l1": jax.lax.pmean(auxout["l1"], "data"),
            "depth_loss": jax.lax.pmean(auxout["depth_loss"], "data"),
            "seg_loss": jax.lax.pmean(auxout["seg_loss"], "data"),
            "overflow": ovf_any,
            "num_rendered": jax.lax.pmax(auxout["num_rendered"], "data"),
            "num_padded": jax.lax.pmax(auxout["num_padded"], "data"),
            "n_visible": jax.lax.pmax(
                jnp.sum(auxout["visibility"]).astype(jnp.int32), "data"),
        }
        return params, opt_state, aux, metrics

    rep = P()
    sharded = P("data")
    batch_spec = sharded
    fn = shard_map(
        device_step, mesh,
        in_specs=(rep, rep, rep, batch_spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
    )
    return jax.jit(fn)


def make_parallel_appearance_step(mesh: Mesh, cfg: RasterizeConfig, opt,
                                  sh_degree: int, depth_loss_choice,
                                  use_seg: bool, bg: jnp.ndarray,
                                  app_lr: float = 1e-4,
                                  track_stats: bool = True):
    """Data-parallel train step with the per-camera appearance embedding
    composed in (VERDICT r3 item 7; reference single-GPU analogue:
    gaussian_renderer/__init__.py:112-199 + train.py:100-104,188-190).

    The embedding table shards NATURALLY with the camera batch: each device
    renders its own camera, looks up its own uid row, and multiplies its own
    RGB factors; appearance gradients (disjoint embedding rows + shared MLP
    weights) are pmean'd over ICI exactly like the gaussian gradients, then
    every chip applies the identical replicated Adam update.
    """
    loss_fn = make_loss_fn(cfg, opt, sh_degree, depth_loss_choice, use_seg,
                           bg, use_appearance=True)

    def device_step(params, opt_state, aux, app_params, app_opt_state,
                    batch, lrs, key):
        old = (params, opt_state, aux, app_params, app_opt_state)
        b = jax.tree_util.tree_map(lambda x: x[0], batch)
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        Pn = params.xyz.shape[0]
        m2d_off = jnp.zeros((Pn, 2), jnp.float32)
        (loss, auxout), (gparams, g_m2d, g_app) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 4), has_aux=True)(
            params, m2d_off, b, key, app_params)

        gparams = jax.lax.pmean(gparams, "data")
        # Embedding rows are DISJOINT per device (each camera touches only
        # its own uid row), so pmean would shrink the per-row gradient by
        # 1/N_devices — a silent per-row LR change vs the reference's
        # single-camera update (ADVICE r4).  psum restores each row's own
        # full gradient; the shared MLP weights keep mean-of-grads.
        g_app = jax.lax.pmean(g_app, "data")._replace(
            emb=jax.lax.psum(g_app.emb, "data"))
        loss = jax.lax.pmean(loss, "data")

        if track_stats:
            scale = jnp.array([0.5 * cfg.width, 0.5 * cfg.height])
            gnorm = jnp.linalg.norm(g_m2d * scale[None, :], axis=-1)
            vis = auxout["radii"] > 0
            aux = aux._replace(
                xyz_gradient_accum=aux.xyz_gradient_accum + jax.lax.psum(
                    jnp.where(vis, gnorm, 0.0), "data"),
                denom=aux.denom + jax.lax.psum(
                    vis.astype(jnp.float32), "data"),
                max_radii2d=jax.lax.pmax(
                    jnp.where(vis, jnp.maximum(
                        aux.max_radii2d,
                        auxout["radii"].astype(jnp.float32)),
                        aux.max_radii2d), "data"),
            )

        lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
        params, opt_state = adam.update(gparams, opt_state, params, lrs_tree)
        app_lrs = jax.tree_util.tree_map(lambda _: app_lr, app_params)
        app_params, app_opt_state = adam.update(
            g_app, app_opt_state, app_params, app_lrs)
        ovf_any = jax.lax.pmax(auxout["overflow"].astype(jnp.int32), "data")
        from gsplat_tpu.train.trainer import gate_on_overflow
        (params, opt_state, aux, app_params,
         app_opt_state) = gate_on_overflow(
            ovf_any > 0,
            (params, opt_state, aux, app_params, app_opt_state), old)
        metrics = {
            "loss": loss, "l1": jax.lax.pmean(auxout["l1"], "data"),
            "depth_loss": jax.lax.pmean(auxout["depth_loss"], "data"),
            "seg_loss": jax.lax.pmean(auxout["seg_loss"], "data"),
            "overflow": ovf_any,
            "num_rendered": jax.lax.pmax(auxout["num_rendered"], "data"),
            "num_padded": jax.lax.pmax(auxout["num_padded"], "data"),
            "n_visible": jax.lax.pmax(
                jnp.sum(auxout["visibility"]).astype(jnp.int32), "data"),
        }
        return (params, opt_state, aux, app_params, app_opt_state, metrics)

    rep = P()
    fn = shard_map(
        device_step, mesh,
        in_specs=(rep, rep, rep, rep, rep, P("data"), rep, rep),
        out_specs=(rep, rep, rep, rep, rep, rep),
    )
    return jax.jit(fn)
