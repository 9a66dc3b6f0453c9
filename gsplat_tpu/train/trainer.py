"""Training step + loop.

Behavioral spec: reference train.py:33-216 / train_segment.py (loss mix,
densification schedule, opacity resets, checkpointing) — re-architected so
the per-iteration work is ONE jit-compiled pure function over fixed-shape
state (SURVEY.md §7.1); only densification boundaries and IO run on the host.
"""
from __future__ import annotations

import functools
import os
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import transforms as T
from gsplat_tpu.models import adam
from gsplat_tpu.models.densify import add_densification_stats, densify_and_prune, reset_opacity
from gsplat_tpu.models.gaussians import GaussianModel, GaussianParams
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
from gsplat_tpu.train import losses as L
from gsplat_tpu.train.schedules import make_lr_fn


def camera_batch(cam, gt_depth=None, gt_seg=None):
    """Host: extract the per-camera device arrays for a train step."""
    if gt_depth is None and gt_seg is None and hasattr(cam, "_pixels"):
        # LazyCamera: one decode for all three planes (each property access
        # would re-decode the file)
        image, gt_depth, gt_seg = cam._pixels()
    else:
        image = cam.image
    b = {
        "uid": jnp.int32(getattr(cam, "uid", 0)),
        "viewmatrix": jnp.asarray(cam.world_view_transform),
        "projmatrix": jnp.asarray(cam.full_proj_transform),
        "campos": jnp.asarray(cam.camera_center),
        "tan_fovx": jnp.float32(cam.tan_fovx),
        "tan_fovy": jnp.float32(cam.tan_fovy),
        "gt_image": jnp.asarray(image),
    }
    depth = gt_depth if gt_depth is not None else getattr(cam, "depth", None)
    seg = gt_seg if gt_seg is not None else getattr(cam, "segment", None)
    b["gt_depth"] = (jnp.asarray(depth) if depth is not None
                     else jnp.zeros((1, cam.image_height, cam.image_width)))
    b["has_depth"] = jnp.asarray(depth is not None)
    b["gt_seg"] = (jnp.asarray(seg).astype(jnp.int32) if seg is not None
                   else jnp.zeros((cam.image_height, cam.image_width), jnp.int32))
    b["has_seg"] = jnp.asarray(seg is not None)
    return b


def make_loss_fn(cfg: RasterizeConfig, opt, sh_degree: int,
                 depth_loss_choice: Optional[str], use_seg: bool,
                 bg: jnp.ndarray, use_appearance: bool = False,
                 convert_shs_python: bool = False,
                 compute_cov3d_python: bool = False):
    """Loss on activated params for one camera. Mirrors train.py:110-141 +
    train_segment.py:125-138 (+ appearance factors, train.py:100-104).
    ``convert_shs_python`` / ``compute_cov3d_python`` route SH->RGB and the
    3D covariance through the jnp oracle paths as precomputed rasterizer
    inputs (reference pipe flags, gaussian_renderer/__init__.py:341-359);
    both are differentiable, so gradients still flow."""

    def loss_fn(params: GaussianParams, m2d_off, batch, key,
                app_params=None):
        colors_precomp = None
        if convert_shs_python:
            from gsplat_tpu.core import sh as sh_lib
            colors_precomp = sh_lib.sh_to_rgb(
                sh_degree,
                jnp.concatenate([params.features_dc, params.features_rest],
                                axis=1),
                params.xyz, batch["campos"])
        cov3d_precomp = None
        if compute_cov3d_python:
            cov3d_precomp = T.covariance_from_scaling_rotation(
                T.scaling_activation(params.scaling), 1.0, params.rotation)
        out = rasterize(
            cfg,
            params.xyz,
            T.scaling_activation(params.scaling),
            params.rotation,
            T.opacity_activation(params.opacity[:, 0]),
            jnp.concatenate([params.features_dc, params.features_rest], axis=1),
            viewmatrix=batch["viewmatrix"],
            projmatrix=batch["projmatrix"],
            campos=batch["campos"],
            tan_fovx=batch["tan_fovx"],
            tan_fovy=batch["tan_fovy"],
            bg=bg,
            segments=(T.segment_activation(params.segment)
                      if cfg.num_class > 0 else None),
            means2d_offset=m2d_off,
            colors_precomp=colors_precomp,
            cov3d_precomp=cov3d_precomp,
        )
        image = out["render"]
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
            # reference normalizes depth by its max before the inverse-depth
            # losses (gaussian_renderer/__init__.py:375 + train.py:114-141)
            depth = out["depth"] / (jnp.max(out["depth"]) + 1e-5)
            dl = L.depth_loss_dispatch(depth_loss_choice, key, depth,
                                       batch["gt_depth"], opt)
            depth_loss = jnp.where(batch["has_depth"], dl, 0.0)
            loss = loss + depth_loss

        seg_loss = jnp.float32(0.0)
        if use_seg and cfg.num_class > 0:
            sl = L.segment_loss(out["segment"], batch["gt_seg"]) * opt.lambda_segment
            seg_loss = jnp.where(batch["has_seg"], sl, 0.0)
            loss = loss + seg_loss

        auxout = {
            "l1": l1, "depth_loss": depth_loss, "seg_loss": seg_loss,
            "radii": out["radii"], "visibility": out["visibility"],
            "overflow": out["overflow"], "num_rendered": out["num_rendered"],
            "num_padded": out.get("num_padded", out["num_rendered"]),
            "render": image,
        }
        return loss, auxout

    return loss_fn


def gate_on_overflow(pred, new_tree, old_tree):
    """An instance-capacity-overflow step renders with DROPPED instances —
    its gradients are garbage.  Freeze every state leaf at the pre-step
    value when ``pred`` (the rasterizer's overflow flag) is set; the metrics
    still report the overflow so the host regrows capacity and the skipped
    step costs one iteration, not the model (r4: an overflowing densify
    step previously poisoned training state)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(pred, o, n), new_tree, old_tree)


def make_appearance_step(cfg: RasterizeConfig, opt, sh_degree: int,
                         depth_loss_choice: Optional[str], use_seg: bool,
                         bg: jnp.ndarray, app_lr: float = 1e-4,
                         convert_shs_python: bool = False,
                         compute_cov3d_python: bool = False):
    """Train-step variant that jointly optimizes the appearance embedding
    (reference train.py:100-104,188-190)."""
    loss_fn = make_loss_fn(cfg, opt, sh_degree, depth_loss_choice, use_seg,
                           bg, use_appearance=True,
                           convert_shs_python=convert_shs_python,
                           compute_cov3d_python=compute_cov3d_python)

    @jax.jit
    def step(params, opt_state, aux, app_params, app_opt_state, batch, lrs,
             key):
        old = (params, opt_state, aux, app_params, app_opt_state)
        P = params.xyz.shape[0]
        m2d_off = jnp.zeros((P, 2), jnp.float32)
        (loss, auxout), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 4), has_aux=True)(
            params, m2d_off, batch, key, app_params)
        gparams, g_m2d, g_app = grads

        scale = jnp.array([0.5 * cfg.width, 0.5 * cfg.height])
        aux = add_densification_stats(aux, g_m2d * scale[None, :],
                                      auxout["radii"])
        lrs_tree = GaussianParams(**{k: lrs[k] for k in GaussianParams._fields})
        params, opt_state = adam.update(gparams, opt_state, params, lrs_tree)
        app_lrs = jax.tree_util.tree_map(lambda _: app_lr, app_params)
        app_params, app_opt_state = adam.update(
            g_app, app_opt_state, app_params, app_lrs)
        (params, opt_state, aux, app_params, app_opt_state) = gate_on_overflow(
            auxout["overflow"],
            (params, opt_state, aux, app_params, app_opt_state), old)
        metrics = {
            "loss": loss, "l1": auxout["l1"],
            "depth_loss": auxout["depth_loss"], "seg_loss": auxout["seg_loss"],
            "overflow": auxout["overflow"],
            "num_rendered": auxout["num_rendered"],
            "num_padded": auxout["num_padded"],
            "n_visible": jnp.sum(auxout["visibility"]),
        }
        return params, opt_state, aux, app_params, app_opt_state, metrics

    return step


def make_train_step(cfg: RasterizeConfig, opt, sh_degree: int,
                    depth_loss_choice: Optional[str], use_seg: bool,
                    bg: jnp.ndarray, track_stats: bool = True,
                    convert_shs_python: bool = False,
                    compute_cov3d_python: bool = False):
    loss_fn = make_loss_fn(cfg, opt, sh_degree, depth_loss_choice, use_seg,
                           bg, convert_shs_python=convert_shs_python,
                           compute_cov3d_python=compute_cov3d_python)

    @jax.jit
    def step(params, opt_state, aux, batch, lrs, key):
        old = (params, opt_state, aux)
        P = params.xyz.shape[0]
        m2d_off = jnp.zeros((P, 2), jnp.float32)
        (loss, auxout), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, m2d_off, batch, key)
        gparams, g_m2d = grads

        # densification stats: NDC-scaled mean2d grad norm
        # (backward.cu:627-628; add_densification_stats gaussian_model.py:523)
        if track_stats:
            scale = jnp.array([0.5 * cfg.width, 0.5 * cfg.height])
            aux = add_densification_stats(aux, g_m2d * scale[None, :],
                                          auxout["radii"])

        lrs_tree = GaussianParams(
            xyz=lrs["xyz"], features_dc=lrs["features_dc"],
            features_rest=lrs["features_rest"], scaling=lrs["scaling"],
            rotation=lrs["rotation"], opacity=lrs["opacity"],
            segment=lrs["segment"])
        params, opt_state = adam.update(gparams, opt_state, params, lrs_tree)
        params, opt_state, aux = gate_on_overflow(
            auxout["overflow"], (params, opt_state, aux), old)
        metrics = {
            "loss": loss, "l1": auxout["l1"],
            "depth_loss": auxout["depth_loss"], "seg_loss": auxout["seg_loss"],
            "overflow": auxout["overflow"],
            "num_rendered": auxout["num_rendered"],
            "num_padded": auxout["num_padded"],
            "n_visible": jnp.sum(auxout["visibility"]),
        }
        return params, opt_state, aux, metrics

    return step


class Trainer:
    """Host-side loop: mirrors train.py's schedule (densify every 100 its
    between 500 and 15k, opacity reset every 3k, SH degree up every 1k)."""

    def __init__(self, model: GaussianModel, scene, opt, *, bg=None,
                 depth_loss_choice=None, use_seg=False, backend="auto",
                 max_instances=0, seed=0, model_path=None,
                 gui_source_path=None, grad_precision="bf16", cull="none",
                 data_parallel=1, use_appearance=False, tile_parallel=1,
                 gt_cache=0, feat_precision="bf16",
                 convert_shs_python=False, compute_cov3d_python=False,
                 debug_from=-1, vs_prune=False, white_background=False):
        # grad_precision: per-instance gradient rows rounded to bf16 before
        # the exact f32 per-gaussian sum (halves the reduce-sort payload,
        # ~0.2% relative rounding on individual terms — the training
        # default; pass "f32" for bitwise-grade gradient parity runs).
        # cull="exact": drop provably-invisible (gaussian, tile) instances
        # (bit-equal images; pays off on trained anisotropic scenes — the
        # capacity shrink logic below sizes to the CULLED count).
        # data_parallel: cameras per step == mesh size (the TPU scaling axis
        # the single-GPU reference lacks, SURVEY.md §2.3): params replicated,
        # per-camera grads pmean'd over ICI, densify stats psum/pmax'd.
        # 1 = off, -1 = all local devices, N = first N devices.
        self.model = model
        self.scene = scene
        self.opt = opt
        self.use_seg = use_seg
        self.depth_loss_choice = depth_loss_choice
        self.backend = backend
        self.model_path = model_path
        # pipe.convert_SHs_python / pipe.compute_cov3D_python: jnp-oracle
        # precompute backends (reference gaussian_renderer/__init__.py:341-359)
        self.convert_shs_python = convert_shs_python
        self.compute_cov3d_python = compute_cov3d_python
        # --debug_from: from this iteration on, verify each step's loss is
        # finite and dump a snapshot on failure (the TPU equivalent of the
        # reference's pipe.debug snapshot_fw.dump, diff_gaussian_rasterization/
        # __init__.py:87-94); -1 = off
        self.debug_from = debug_from
        # vs_prune=True restores the pre-r5 screen-radius prune — an
        # ablation arm only; the reference's big_points_vs check is inert
        # (see models/densify.py::densify_and_prune)
        self.vs_prune = vs_prune
        # white_background triggers the reference's extra opacity reset at
        # densify_from_iter (train.py:178-180)
        self.white_background = white_background
        self.last_densify = None  # dict written after each densify call
        if (convert_shs_python or compute_cov3d_python) and (
                (data_parallel and data_parallel != 1) or tile_parallel > 1):
            # NOTE: this guard must stay ahead of any parallel step builder
            # — the parallel step factories (incl. the appearance variants)
            # do not thread these oracle flags through, so relaxing it
            # would silently ignore them (ADVICE r4).
            raise ValueError("convert_SHs_python/compute_cov3D_python are "
                             "single-device debug backends")
        cams = scene.getTrainCameras()
        W, H = cams[0].image_width, cams[0].image_height
        self.appearance = None
        if use_appearance:
            # per-camera learned RGB factors jointly optimized with the
            # gaussians (reference train.py:42-44,100-104,188-190).
            # Composable with --data_parallel: the embedding table shards
            # naturally with the camera batch (each device looks up its own
            # uid row), appearance grads pmean over ICI like the gaussian
            # grads (parallel/data_parallel.py::make_parallel_appearance_step)
            # Composable with --tile_parallel / the 2D mesh too (r5): the
            # factors are per-camera, computed once outside shard_map and
            # multiplied into the row-sharded image (tile_parallel.py /
            # mesh2d.py appearance paths).
            from gsplat_tpu.models.appearance import AppearanceOptimizer
            n_uid = max((getattr(c, "uid", 0) for c in cams), default=0) + 1
            self.appearance = AppearanceOptimizer(max(n_uid, len(cams)))
        self.mesh = None
        self.data_parallel = 0
        self.tile_parallel = tile_parallel if tile_parallel > 1 else 0
        from gsplat_tpu.ops.preprocess import TILE_Y
        if self.tile_parallel and H % (TILE_Y * self.tile_parallel) != 0:
            raise ValueError(
                f"--tile_parallel {self.tile_parallel} needs the image "
                f"height ({H}) to split into whole {TILE_Y}-px tile rows "
                "per device")
        if data_parallel and data_parallel != 1:
            navail = len(jax.devices()) // max(1, self.tile_parallel)
            ndev = (navail if data_parallel < 0
                    else min(data_parallel, navail))
            if ndev > 1:
                bad = [c for c in cams
                       if (c.image_width, c.image_height) != (W, H)]
                if bad:
                    raise ValueError(
                        "--data_parallel requires a uniform camera "
                        f"resolution; got {len(bad)} cameras != {W}x{H}")
                if self.tile_parallel:
                    # composed (M, N) data x tile mesh (BASELINE config 5)
                    from gsplat_tpu.parallel.mesh2d import make_2d_mesh
                    self.mesh = make_2d_mesh(ndev, self.tile_parallel)
                else:
                    from gsplat_tpu.parallel.data_parallel import (
                        make_data_mesh,
                    )
                    self.mesh = make_data_mesh(ndev)
                self.data_parallel = ndev
                # multi-host: this process feeds only its local devices;
                # the ShardedCameraSampler keeps all processes' shuffles
                # (and hence the densify-schedule RNG, SURVEY §7.3) in
                # lockstep without communication
                self.n_procs = jax.process_count()
                self.proc_idx = jax.process_index()
                self._sampler = None
                print(f"[parallel] {ndev} camera(s) x "
                      f"{max(1, self.tile_parallel)} tile slice(s) per "
                      f"step over {ndev * max(1, self.tile_parallel)} "
                      f"devices, {self.n_procs} process(es)")
        if self.tile_parallel and not self.data_parallel:
            from gsplat_tpu.parallel.tile_parallel import make_tile_mesh
            self.mesh = make_tile_mesh(self.tile_parallel)
            print(f"[parallel] tile-sharded training over "
                  f"{self.tile_parallel} devices (one camera per step, "
                  "row slices over ICI)")
        P = model.capacity
        self._auto_capacity = max_instances <= 0
        if max_instances <= 0:
            # provisional until _autosize_capacity measures the real scene
            max_instances = max(1 << 18, int(2 ** np.ceil(np.log2(max(P, 2) * 8))))
        self.max_instances = max_instances
        self.bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
        self.key = jax.random.PRNGKey(seed)
        self.lr_fn = make_lr_fn(opt, model.spatial_lr_scale)
        self._steps = {}
        # feat_precision="bf16" is the training default alongside the
        # bf16 grad reduce: feature columns (rgb/depth/seg) packed as bf16
        # pairs keep the attr table in the fast 8-column gather class
        # (bench 21.3 -> 22.6 Mpix/s); ~0.4% feature rounding, under half
        # an 8-bit output LSB.  Pass "f32" for bitwise-grade parity runs.
        self._cfg = lambda sh, mi=None: RasterizeConfig(
            width=W, height=H, sh_degree=sh,
            num_class=model.num_class if use_seg else 0,
            max_instances=mi if mi else self.max_instances, backend=backend,
            grad_precision=grad_precision, cull=cull,
            feat_precision=feat_precision, mxu_power=True)
        self.ema_loss = 0.0
        self.gui_source_path = gui_source_path  # enables SIBR socket polling
        # compile-ahead state: capacity growth and SH-degree bumps recompile
        # the step (~50 s at 1080p, BENCH_r01); a background thread lowers +
        # compiles the NEXT variant while training continues at the current
        # one, so the swap is stall-free (VERDICT r1 item 6)
        self._pending = {}           # (sh, model_cap, max_inst) -> holder
        self._example_args = None
        from collections import deque
        self._pending_checks = deque()   # (it, npad, nr, overflow, max_i)
        self._check_interval = 1         # adaptive (see train loop)
        self._resize_iter = -10**9       # shrink cooldown anchor
        self._reset_iter = -10**9        # last opacity reset (demand dip)
        # LRU cap on the per-camera device-batch cache.  Unbounded caching
        # (round-2 behavior) pins every camera's GT image (+depth/seg) in
        # HBM forever — at the reference's 1600px cap with a few hundred
        # cameras that is tens of GB.  0 = auto: ~2 GB of GT batches.
        if gt_cache <= 0:
            planes = 3 + 2  # rgb + depth + seg (seg int32 counts as one)
            per_batch = planes * W * H * 4
            gt_cache = max(8, int(2e9 // max(per_batch, 1)))
        self._gt_cache = max(gt_cache, 2 * max(1, self.data_parallel))
        from collections import OrderedDict
        self._batches = OrderedDict()

    def _build_step(self, sh_degree, max_instances):
        use_app = self.appearance is not None
        app_lr = self.appearance.lr if use_app else 1e-4
        if self.data_parallel and self.tile_parallel:
            from gsplat_tpu.parallel.mesh2d import make_2d_train_step
            return make_2d_train_step(
                self.mesh, self._cfg(sh_degree, max_instances), self.opt,
                sh_degree, self.depth_loss_choice, self.use_seg, self.bg,
                use_appearance=use_app, app_lr=app_lr)
        if self.tile_parallel:
            from gsplat_tpu.parallel.tile_parallel import (
                make_tile_sharded_train_step,
            )
            return make_tile_sharded_train_step(
                self.mesh, self._cfg(sh_degree, max_instances), self.opt,
                sh_degree, self.depth_loss_choice, self.use_seg, self.bg,
                use_appearance=use_app, app_lr=app_lr)[0]
        if self.data_parallel:
            if self.appearance is not None:
                from gsplat_tpu.parallel.data_parallel import (
                    make_parallel_appearance_step,
                )
                return make_parallel_appearance_step(
                    self.mesh, self._cfg(sh_degree, max_instances),
                    self.opt, sh_degree, self.depth_loss_choice,
                    self.use_seg, self.bg, app_lr=self.appearance.lr)
            from gsplat_tpu.parallel.data_parallel import (
                make_parallel_train_step,
            )
            return make_parallel_train_step(
                self.mesh, self._cfg(sh_degree, max_instances), self.opt,
                sh_degree, self.depth_loss_choice, self.use_seg, self.bg)
        if self.appearance is not None:
            return make_appearance_step(
                self._cfg(sh_degree, max_instances), self.opt, sh_degree,
                self.depth_loss_choice, self.use_seg, self.bg,
                app_lr=self.appearance.lr,
                convert_shs_python=self.convert_shs_python,
                compute_cov3d_python=self.compute_cov3d_python)
        return make_train_step(
            self._cfg(sh_degree, max_instances), self.opt, sh_degree,
            self.depth_loss_choice, self.use_seg, self.bg,
            convert_shs_python=self.convert_shs_python,
            compute_cov3d_python=self.compute_cov3d_python)

    def _step_fn(self, sh_degree):
        k = (sh_degree, self.model.capacity, self.max_instances)
        if k not in self._steps:
            # adopt a finished background compile if one matches
            holder = self._pending.pop(k, None)
            if holder is not None and "exe" in holder:
                self._steps[k] = holder["exe"]
            else:
                self._steps[k] = self._build_step(
                    sh_degree, self.max_instances)
        return self._steps[k]

    def _precompile_async(self, sh_degree, max_instances):
        """Lower + compile step variant (sh_degree, max_instances) in a
        daemon thread; result adopted by _step_fn / _try_adopt_pending."""
        k = (sh_degree, self.model.capacity, max_instances)
        if (k in self._steps or k in self._pending
                or self._example_args is None):
            return
        holder = {}
        self._pending[k] = holder
        example = self._example_args

        def work():
            try:
                fn = self._build_step(sh_degree, max_instances)
                holder["exe"] = fn.lower(*example).compile()
            except Exception as e:          # adoption falls back to sync
                holder["err"] = e

        th = threading.Thread(target=work, daemon=True,
                              name=f"precompile-{sh_degree}-{max_instances}")
        holder["thread"] = th
        th.start()

    def _pending_inflight_covers(self, sh_degree, needed: int) -> bool:
        """True if a background compile is IN FLIGHT that, once finished, can
        actually be adopted for the projected demand (same sh_degree and
        model capacity, instance capacity >= needed).  Growth is only
        deferred on such a compile — waiting on a mismatched one (different
        sh or too small) could never pay off."""
        for (sh, mcap, mi), h in self._pending.items():
            if ("exe" not in h and "err" not in h and sh == sh_degree
                    and mcap == self.model.capacity and mi >= needed):
                return True
        return False

    def _try_adopt_pending(self, sh_degree, needed: int) -> bool:
        """If a finished background compile covers >= needed instances,
        switch to its capacity without any stall. Returns True on adoption."""
        best = None
        for k, holder in self._pending.items():
            sh, mcap, mi = k
            if (sh == sh_degree and mcap == self.model.capacity
                    and mi >= needed and "exe" in holder
                    and (best is None or mi < best[0][2])):
                best = (k, holder)
        if best is None:
            return False
        k, holder = best
        self._pending.pop(k)
        self.max_instances = k[2]
        self._steps = {k: holder["exe"]}
        return True

    def _autosize_capacity(self, cams):
        """Measure the scene's real instance demand on a few cameras and
        size the fixed binning capacity snugly (1.35x + per-tile alignment
        pads) instead of the static P*8 guess — every binning/gather/sort
        cost scales with capacity, so a 2x over-provision is ~15% of a
        whole train step.  Rounded to 128k blocks to limit recompiles."""
        from gsplat_tpu.ops import preprocess as pre_lib
        cfg = self._cfg(self.model.max_sh_degree)

        @jax.jit
        def count(params, batch):
            pre = pre_lib.preprocess(
                params.xyz, T.scaling_activation(params.scaling),
                params.rotation,
                T.opacity_activation(params.opacity[:, 0]),
                jnp.concatenate([params.features_dc, params.features_rest],
                                axis=1),
                self.model.max_sh_degree, batch["viewmatrix"],
                batch["projmatrix"], batch["campos"], batch["tan_fovx"],
                batch["tan_fovy"], cfg.width, cfg.height)
            rh = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)
            rows = jnp.sum(jnp.where(pre.visible, rh, 0))
            return jnp.sum(pre.tiles_touched), rows

        demands = [count(self.model.params, camera_batch(c))
                   for c in cams[: min(4, len(cams))]]
        nr = max(int(d[0]) for d in demands)
        rows = max(int(d[1]) for d in demands)
        pads = cfg.grid_x * cfg.grid_y * 64  # expected pad-inline overhead
        # the exact-cull row stage's capacity defaults to max_instances//2
        # (binning.py); rows scale with TILE_Y only, so at wide tiles
        # (TILE_X=32 default) instance demand shrinks while rows don't —
        # size the capacity to cover BOTH (overflow flag + geometric regrow
        # still guard drift during densification)
        self._resize_capacity(max(int(nr * 1.35) + pads,
                                  2 * int(rows * 1.35)))

    def _resize_capacity(self, needed: int):
        blk = 1 << 17
        self.max_instances = max(1 << 18, (needed + blk - 1) // blk * blk)
        self._steps.clear()

    def train(self, iterations=None, *, test_iterations=(), save_iterations=(),
              checkpoint_iterations=(), log_every=10, callback=None,
              first_iter=0, profile_dir=None, profile_iters=(50, 80)):
        """``profile_dir``: capture a jax.profiler trace (XProf-compatible)
        over iterations [profile_iters) — the TPU equivalent of the
        reference's torch.cuda.Event iter timing (train.py:63-64; SURVEY §5)."""
        opt = self.opt
        iterations = iterations or opt.iterations
        m = self.model
        cams = list(self.scene.getTrainCameras())
        if self._auto_capacity:
            self._autosize_capacity(cams)
            self._auto_capacity = False
            print(f"[capacity] instance capacity sized to "
                  f"{self.max_instances} from measured scene demand")
        stack = []
        rng = np.random.default_rng(0)

        t_start = time.time()
        for it in range(first_iter + 1, iterations + 1):
            if profile_dir and it - first_iter == profile_iters[0]:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and it - first_iter == profile_iters[1]:
                jax.block_until_ready(m.params.xyz)
                jax.profiler.stop_trace()
                print(f"[it {it}] profiler trace written to {profile_dir}")
            # live-viewer poll (reference train.py:71-84)
            if self.gui_source_path is not None:
                from gsplat_tpu.viz import network_gui
                from gsplat_tpu.renderer import render as render_fn
                if network_gui.listener is not None:
                    network_gui.poll_and_render(
                        m, self.gui_source_path,
                        lambda cam, g, sm: render_fn(
                            cam, g, bg_color=self.bg, scaling_modifier=sm,
                            backend=self.backend,
                            max_instances=self.max_instances))
            if it % 1000 == 0:
                m.oneup_sh_degree()
            if self.data_parallel:
                from gsplat_tpu.parallel.data_parallel import (
                    stack_camera_batches,
                )
                from gsplat_tpu.parallel.multihost import (
                    ShardedCameraSampler, make_global_batch,
                )
                if self._sampler is None:
                    self._sampler = ShardedCameraSampler(
                        len(cams), self.data_parallel // self.n_procs,
                        self.proc_idx, self.n_procs, seed=0)
                idxs = self._sampler.sample()
                batch = stack_camera_batches(
                    [self._get_batch(cams, i) for i in idxs])
                if self.n_procs > 1:
                    batch = make_global_batch(self.mesh, batch)
            else:
                if not stack:
                    stack = list(range(len(cams)))
                cam_idx = stack.pop(rng.integers(0, len(stack)))
                batch = self._get_batch(cams, cam_idx)

            lrs = {k: jnp.float32(v) for k, v in self.lr_fn(it).items()}
            self.key, k1, k2 = jax.random.split(self.key, 3)
            step = self._step_fn(m.active_sh_degree)
            if self.appearance is not None:
                app = self.appearance
                args = (m.params, m.opt_state, m.aux, app.params,
                        app.opt_state, batch, lrs, k1)
                (m.params, m.opt_state, m.aux, app.params, app.opt_state,
                 metrics) = step(*args)
            else:
                args = (m.params, m.opt_state, m.aux, batch, lrs, k1)
                m.params, m.opt_state, m.aux, metrics = step(*args)
            if 0 <= self.debug_from <= it:
                # reference pipe.debug from --debug_from: force a per-step
                # finite check (one device sync) and dump a snapshot of the
                # step inputs on failure (snapshot_fw.dump analogue)
                loss_now = float(metrics["loss"])
                if not np.isfinite(loss_now):
                    snap = os.path.join(self.model_path or ".",
                                        f"snapshot_fw_{it}.npz")
                    arrs = {f"param_{k}": np.asarray(v) for k, v in
                            zip(m.params._fields, m.params)}
                    arrs.update({f"batch_{k}": np.asarray(v)
                                 for k, v in batch.items()})
                    np.savez(snap, **arrs)
                    raise FloatingPointError(
                        f"non-finite loss {loss_now} at iteration {it}; "
                        f"step inputs dumped to {snap}")
            # avals only: fn.lower() needs shapes/dtypes, not live buffers —
            # pinning concrete arrays here held a params+opt_state worth of
            # HBM for the whole run.  Refreshed every step so background
            # compiles always see the current capacity's shapes.
            self._example_args = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.result_type(x)), args)
            # compile-ahead for the next SH-degree bump (every 1000 iters,
            # loop top): start the background compile ~100 iters early
            if (it % 1000 >= 600 and m.active_sh_degree < m.max_sh_degree
                    and it + (1000 - it % 1000) <= iterations):
                self._precompile_async(m.active_sh_degree + 1,
                                       self.max_instances)

            # Capacity management with an ADAPTIVE check cadence.  A scalar
            # readback costs a full device round trip (~70-90 ms over a
            # remote TPU tunnel — checking every iteration doubled the
            # 1600px step time), and copy_to_host_async over that transport
            # returns garbage for not-yet-computed arrays (observed: nr
            # ~300k for a real 720k, causing capacity thrashing).  So: the
            # previous steps' metrics are consumed with plain synchronous
            # reads, every iteration only when utilization is NEAR the
            # capacity limits (the regime where a silent overflow could
            # degrade gradients), every ~10 otherwise — and always right
            # after a densification event, the only place demand can jump
            # stepwise.  Metrics from before the last resize are stale —
            # skipped.
            self._pending_checks.append(
                (it, metrics.get("num_padded", metrics["num_rendered"]),
                 metrics["num_rendered"], metrics["overflow"],
                 self.max_instances))
            if it % self._check_interval == 0:
                while len(self._pending_checks) > 2:
                    (cit, p_np, p_nr, p_ov,
                     p_mi) = self._pending_checks.popleft()
                    if p_mi != self.max_instances:
                        continue
                    npad, ov = int(p_np), bool(p_ov)
                    util = npad / max(self.max_instances, 1)
                    self._check_interval = (1 if ov or util > 0.8
                                            else 3 if util > 0.55 else 10)
                    self._manage_capacity(cit, npad, ov)

            if it % log_every == 0 or it == iterations:
                loss = float(metrics["loss"])
                self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
                if callback:
                    callback(it, metrics, self)
                # graceful external stop: touching <model_path>/STOP ends
                # the run cleanly (checkpoint + PLY) — killing a process
                # mid-execute can wedge remote-TPU transports
                if self.model_path and os.path.exists(
                        os.path.join(self.model_path, "STOP")):
                    print(f"[it {it}] STOP file found — saving and exiting")
                    self.scene.save(it)
                    m.save_checkpoint(
                        os.path.join(self.model_path, f"chkpnt{it}.npz"), it)
                    break

            # densification schedule (train.py:169-180)
            if it < opt.densify_until_iter:
                if (it > opt.densify_from_iter
                        and it % opt.densification_interval == 0):
                    alive_before = m.num_alive
                    size_thr = 20.0 if it > opt.opacity_reset_interval else 0.0
                    m.params, m.aux, m.opt_state, dstats = densify_and_prune(
                        m.params, m.aux, m.opt_state, k2,
                        opt.densify_grad_threshold, 0.005,
                        self.scene.cameras_extent, size_thr,
                        opt.percent_dense,
                        use_screen_size=it > opt.opacity_reset_interval,
                        vs_prune=self.vs_prune)
                    self.last_densify = {
                        "iter": it, "n_cloned": int(dstats.n_cloned),
                        "n_split": int(dstats.n_split),
                        "n_pruned": int(dstats.n_pruned),
                        "n_dropped": int(dstats.n_dropped),
                        "n_alive": int(dstats.n_alive)}
                    if bool(dstats.n_dropped):
                        print(f"[it {it}] WARNING: {int(dstats.n_dropped)} "
                              "densify targets dropped (capacity full)")
                    self._check_interval = 1  # demand just jumped stepwise
                    # densification changes instance demand STEPWISE (the
                    # next render's nr scales ~ alive growth) — the 72%
                    # log-tick prewarm can be jumped right past, so predict
                    # here and start the background compile immediately
                    alive_after = m.num_alive
                    if (alive_before and alive_after > alive_before
                            and self._example_args is not None):
                        growth = alive_after / alive_before
                        last_np = int(metrics.get(
                            "num_padded", metrics["num_rendered"]))
                        predicted = int(last_np * growth)
                        if predicted > 0.72 * self.max_instances:
                            blk = 1 << 17
                            target = max(
                                self.max_instances + blk,
                                (int(predicted * 1.35) + blk - 1)
                                // blk * blk)
                            self._precompile_async(m.active_sh_degree,
                                                   target)
                if it % opt.opacity_reset_interval == 0 or (
                        self.white_background
                        and it == opt.densify_from_iter):
                    # second clause: reference train.py:178-180 resets once
                    # at densify_from_iter on white-background datasets
                    m.params, m.opt_state = reset_opacity(
                        m.params, m.aux, m.opt_state)
                    self._reset_iter = it

            if it in save_iterations:
                print(f"\n[ITER {it}] Saving Gaussians")
                self.scene.save(it)
                if self.appearance is not None and self.model_path:
                    # beside the PLY, like the reference's
                    # appearance_embedding.ckpt (train.py:164-167)
                    self.appearance.save(os.path.join(
                        self.model_path, "point_cloud", f"iteration_{it}",
                        "appearance_embedding.npz"))
            if it in checkpoint_iterations and self.model_path:
                print(f"\n[ITER {it}] Saving Checkpoint")
                m.save_checkpoint(
                    os.path.join(self.model_path, f"chkpnt{it}.npz"), it)
                if self.appearance is not None:
                    self.appearance.save(
                        os.path.join(self.model_path,
                                     f"appearance_chkpnt{it}.npz"),
                        with_opt=True)
            if it in test_iterations:
                self.report_test(it)
        return time.time() - t_start

    def _get_batch(self, cams, i):
        """Per-camera device batch through the bounded LRU cache (cap
        ``gt_cache`` entries — see __init__)."""
        b = self._batches.get(i)
        if b is None:
            b = camera_batch(cams[i])
            self._batches[i] = b
            while len(self._batches) > self._gt_cache:
                self._batches.popitem(last=False)
        else:
            self._batches.move_to_end(i)
        return b

    def _manage_capacity(self, it, npad: int, overflow: bool):
        """Densification grows instance demand; regrow the fixed capacity
        (recompile) BEFORE overflow corrupts a step — and recover immediately
        if one did overflow.  ``npad`` is the TRUE padded demand (instances +
        per-tile alignment pads) measured by the binning itself; estimating
        pads host-side undershot badly in sparse regimes (few instances per
        tile pad to a full chunk each) and caused shrink/overflow
        oscillation."""
        m = self.model
        if not overflow and 0.72 * self.max_instances < npad \
                <= 0.9 * self.max_instances:
            # densification is approaching the capacity ceiling — compile
            # the grown step in the background NOW so the 90% trigger below
            # swaps without a stall
            blk = 1 << 17
            target = max(self.max_instances + blk,
                         (int(npad * 1.35) + blk - 1) // blk * blk)
            self._precompile_async(m.active_sh_degree, target)
        if overflow or npad > 0.9 * self.max_instances:
            needed = int(npad * 1.35)
            if overflow:
                print(f"[it {it}] WARNING: instance capacity "
                      f"overflow (padded demand {npad}) — regrowing")
            if self._try_adopt_pending(m.active_sh_degree, needed):
                print(f"[it {it}] instance capacity -> "
                      f"{self.max_instances} (precompiled, stall-free)")
                self._resize_iter = it
            elif overflow or not self._pending_inflight_covers(
                    m.active_sh_degree, needed):
                # No adoptable background compile running: grow now
                # (synchronous compile).  On a mere 90% trigger with a
                # MATCHING compile still in flight, keep training at the
                # current capacity — the overflow flag guards correctness
                # until that compile lands.  On OVERFLOW grow geometrically
                # (>= 2x current): explosive densification (capacity
                # doubling faster than a step compiles) would otherwise
                # stall at every doubling; larger jumps amortize the stalls
                # logarithmically.
                if overflow:
                    needed = max(needed, 2 * self.max_instances)
                self._resize_capacity(needed)
                self._resize_iter = it
                print(f"[it {it}] instance capacity -> {self.max_instances}")
        elif npad < 0.5 * self.max_instances and \
                self.max_instances > (1 << 18) and \
                it - self._resize_iter >= 200 and \
                it - self._reset_iter >= 500:
            # shrink toward ~65% utilization — wide hysteresis vs the 90%
            # grow trigger, a 200-iteration cooldown after any resize, AND
            # a 500-iteration holdoff after opacity resets: the reset
            # transiently halves instance demand (opacity-aware rects
            # shrink at opacity 0.01) and it rebounds within ~100
            # iterations — shrinking into the dip forces a paired regrow
            # recompile (a multi-minute sync stall at 1600px)
            self._resize_capacity(int(npad * 1.5))
            self._resize_iter = it
            print(f"[it {it}] instance capacity shrunk -> "
                  f"{self.max_instances}")

    def report_test(self, it):
        """Periodic eval over the test split AND a 5-camera train sample,
        mirroring the reference's training_report (train.py:227-253: it
        always evaluates idx*5%len train cameras even without --eval).
        Results are appended to <model_path>/eval_log.jsonl so the 7k/30k
        protocol numbers are machine-recoverable from any training run
        (the reference only sends them to TensorBoard, train.py:245-249)."""
        import json

        from gsplat_tpu.renderer import render as render_fn
        train_cams = self.scene.getTrainCameras()
        configs = [("test", self.scene.getTestCameras()),
                   ("train", [train_cams[idx % len(train_cams)]
                              for idx in range(5, 30, 5)] if train_cams
                    else [])]
        result = None
        records = []
        for name, cams in configs:
            if not cams:
                continue
            l1s, psnrs, ssims = [], [], []
            for cam in cams:
                out = render_fn(cam, self.model, bg_color=self.bg,
                                backend=self.backend,
                                max_instances=self.max_instances)
                img = jnp.clip(out["render"], 0, 1)
                gt = jnp.asarray(cam.image)
                l1s.append(float(L.l1_loss(img, gt)))
                psnrs.append(float(L.psnr(img, gt)))
                ssims.append(float(L.ssim(img, gt)))
            print(f"\n[ITER {it}] Evaluating {name}: L1 {np.mean(l1s):.4f} "
                  f"PSNR {np.mean(psnrs):.2f} SSIM {np.mean(ssims):.4f}")
            records.append({"iter": it, "split": name, "n_cams": len(cams),
                            "l1": float(np.mean(l1s)),
                            "psnr": float(np.mean(psnrs)),
                            "ssim": float(np.mean(ssims))})
            if result is None:
                result = float(np.mean(psnrs))
        if self.model_path and records:
            with open(os.path.join(self.model_path, "eval_log.jsonl"),
                      "a") as f:
                for r in records:
                    f.write(json.dumps(r) + "\n")
        return result
