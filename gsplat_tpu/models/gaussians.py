"""Gaussian parameter state — the TPU-native GaussianModel.

Behavioral spec: reference scene/gaussian_model.py:45-526.  Architectural
redesign for XLA (SURVEY.md §7.1): instead of torch tensors that change shape
under densification, parameters live in FIXED-CAPACITY arrays ``[capacity, …]``
with an ``alive`` mask; clone/split/prune are masked scatters into free slots
(models/densify.py) and the whole training step stays jit-compiled.  Dead/free
slots carry opacity logit -30 (sigmoid ~ 0) so they are culled by the
rasterizer's own alpha test without any special casing.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core import transforms as T
from gsplat_tpu.data import ply as ply_io
from gsplat_tpu.models import adam
from gsplat_tpu.ops.knn import dist2_knn

DEAD_OPACITY_LOGIT = -30.0
DEAD_XYZ = 1e8  # park dead gaussians far outside every frustum


class GaussianParams(NamedTuple):
    """Trainable parameters (raw/pre-activation). All [capacity, ...]."""
    xyz: jnp.ndarray            # [C,3]
    features_dc: jnp.ndarray    # [C,1,3]
    features_rest: jnp.ndarray  # [C,K-1,3]
    scaling: jnp.ndarray        # [C,3] log-scale
    rotation: jnp.ndarray       # [C,4] quaternion (unnormalized)
    opacity: jnp.ndarray        # [C,1] logit
    segment: jnp.ndarray        # [C,S] logit


class GaussianAux(NamedTuple):
    """Non-trainable per-gaussian state (densification bookkeeping)."""
    alive: jnp.ndarray              # [C] bool
    max_radii2d: jnp.ndarray        # [C] f32
    xyz_gradient_accum: jnp.ndarray # [C] f32
    denom: jnp.ndarray              # [C] f32


def empty_params(capacity: int, sh_degree: int, num_class: int) -> GaussianParams:
    K = (sh_degree + 1) ** 2
    return GaussianParams(
        xyz=jnp.full((capacity, 3), DEAD_XYZ, jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        scaling=jnp.zeros((capacity, 3), jnp.float32),
        rotation=jnp.concatenate(
            [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=1
        ).astype(jnp.float32),
        opacity=jnp.full((capacity, 1), DEAD_OPACITY_LOGIT, jnp.float32),
        segment=jnp.zeros((capacity, max(num_class, 1)), jnp.float32),
    )


def empty_aux(capacity: int) -> GaussianAux:
    return GaussianAux(
        alive=jnp.zeros((capacity,), bool),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )


class GaussianModel:
    """Host-side container for the functional state.

    Mirrors the reference GaussianModel API where it makes sense; all heavy
    math lives in jitted pure functions that take/return the pytrees.
    """

    def __init__(self, sh_degree: int, num_class: int = 2, capacity: int = 1 << 19):
        self.max_sh_degree = int(sh_degree)
        self.active_sh_degree = 0
        self.num_class = int(num_class)
        self.capacity = int(capacity)
        self.spatial_lr_scale = 1.0
        self.params = empty_params(capacity, sh_degree, num_class)
        self.aux = empty_aux(capacity)
        self.opt_state: Optional[adam.AdamState] = None

    # --- activated views (scene/gaussian_model.py:100-131) -------------------
    @property
    def get_xyz(self):
        return self.params.xyz

    @property
    def get_scaling(self):
        return T.scaling_activation(self.params.scaling)

    @property
    def get_rotation(self):
        return T.rotation_activation(self.params.rotation)

    @property
    def get_opacity(self):
        return T.opacity_activation(self.params.opacity)

    @property
    def get_segment(self):
        return T.segment_activation(self.params.segment)

    @property
    def get_features(self):
        return jnp.concatenate([self.params.features_dc, self.params.features_rest], axis=1)

    @property
    def num_alive(self) -> int:
        return int(jnp.sum(self.aux.alive))

    def oneup_sh_degree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    # --- init (scene/gaussian_model.py:133-160) ------------------------------
    def create_from_pcd(self, points: np.ndarray, colors: np.ndarray,
                        spatial_lr_scale: float):
        n = points.shape[0]
        if n > self.capacity:
            raise ValueError(f"point cloud ({n}) exceeds capacity ({self.capacity})")
        self.spatial_lr_scale = float(spatial_lr_scale)
        pts = jnp.asarray(points, jnp.float32)
        dist2 = jnp.clip(dist2_knn(pts), 1e-7, None)
        scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
        fused_color = sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))

        p = self.params
        idx = jnp.arange(n)
        self.params = GaussianParams(
            xyz=p.xyz.at[idx].set(pts),
            features_dc=p.features_dc.at[idx, 0].set(fused_color),
            features_rest=p.features_rest,
            scaling=p.scaling.at[idx].set(scales),
            rotation=p.rotation,
            opacity=p.opacity.at[idx].set(T.inverse_sigmoid(jnp.full((n, 1), 0.1))),
            segment=p.segment.at[idx].set(
                T.inverse_sigmoid(jnp.full((n, self.params.segment.shape[1]), 0.1))),
        )
        self.aux = self.aux._replace(alive=self.aux.alive.at[idx].set(True))
        print(f"Number of points at initialisation : {n}")

    def training_setup(self):
        self.opt_state = adam.init(self.params)

    def grow_capacity(self, new_capacity: int):
        """Reallocate to a larger fixed capacity, keeping slot indices
        (existing rows copy over; new slots are dead).  The reference just
        concatenates tensors when merging scenes (visualizer.py:196-226);
        here growth is an explicit reallocation so everything else stays
        fixed-shape.  Adam moments (if any) are carried over with zeroed
        state for the new slots."""
        new_capacity = int(new_capacity)
        if new_capacity <= self.capacity:
            return

        old_cap = self.capacity

        def pad(tree_old, tree_empty):
            return type(tree_old)(*[
                e.at[:old_cap].set(o) for o, e in zip(tree_old, tree_empty)])

        self.capacity = new_capacity
        new_params = empty_params(new_capacity, self.max_sh_degree,
                                  self.params.segment.shape[1])
        self.params = pad(self.params, new_params)
        self.aux = pad(self.aux, empty_aux(new_capacity))
        if self.opt_state is not None:
            zeros = adam.init(self.params)
            self.opt_state = adam.AdamState(
                count=self.opt_state.count,
                mu=pad(self.opt_state.mu, zeros.mu),
                nu=pad(self.opt_state.nu, zeros.nu))
        print(f"[model] capacity grown {old_cap} -> {new_capacity}")

    # --- PLY export/import (scene/gaussian_model.py:191-360) -----------------
    def save_ply(self, path: str, mask: Optional[np.ndarray] = None):
        """Reference-schema PLY of the ALIVE gaussians (compacted)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        alive = np.asarray(self.aux.alive)
        if mask is not None:
            alive = alive & np.asarray(mask)
        sel = np.nonzero(alive)[0]
        p = jax.device_get(self.params)

        xyz = p.xyz[sel]
        f_dc = p.features_dc[sel].transpose(0, 2, 1).reshape(len(sel), -1)  # [n,3]
        f_rest = p.features_rest[sel].transpose(0, 2, 1).reshape(len(sel), -1)
        props = {}
        for i, k in enumerate("xyz"):
            props[k] = xyz[:, i].astype(np.float32)
        for i, k in enumerate(["nx", "ny", "nz"]):
            props[k] = np.zeros(len(sel), np.float32)
        for i in range(f_dc.shape[1]):
            props[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
        for i in range(f_rest.shape[1]):
            props[f"f_rest_{i}"] = f_rest[:, i].astype(np.float32)
        props["opacity"] = p.opacity[sel, 0].astype(np.float32)
        for i in range(p.segment.shape[1]):
            props[f"segment_{i}"] = p.segment[sel, i].astype(np.float32)
        for i in range(3):
            props[f"scale_{i}"] = p.scaling[sel, i].astype(np.float32)
        for i in range(4):
            props[f"rot_{i}"] = p.rotation[sel, i].astype(np.float32)
        ply_io.write_ply(path, props, comment="gsplat_tpu")

    def load_ply(self, path: str):
        d = ply_io.read_ply(path)
        n = len(d["x"])
        if n > self.capacity:
            self.capacity = 1 << int(np.ceil(np.log2(n + 1)))
            self.params = empty_params(self.capacity, self.max_sh_degree, self.num_class)
            self.aux = empty_aux(self.capacity)
        xyz = np.stack([d["x"], d["y"], d["z"]], axis=1).astype(np.float32)
        K = (self.max_sh_degree + 1) ** 2
        f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)
        n_rest = 3 * (K - 1)
        rest_names = sorted(
            [k for k in d if k.startswith("f_rest_")], key=lambda s: int(s.split("_")[-1])
        )
        assert len(rest_names) == n_rest, f"expected {n_rest} f_rest, got {len(rest_names)}"
        f_rest = np.stack([d[k] for k in rest_names], axis=1).astype(np.float32)
        f_rest = f_rest.reshape(n, 3, K - 1).transpose(0, 2, 1)
        seg_names = sorted(
            [k for k in d if k.startswith("segment_")], key=lambda s: int(s.split("_")[-1])
        )
        if seg_names:
            seg = np.stack([d[k] for k in seg_names], axis=1).astype(np.float32)
            self.num_class = seg.shape[1]
        else:
            seg = np.zeros((n, max(self.num_class, 1)), np.float32)
        scaling = np.stack([d[f"scale_{i}"] for i in range(3)], axis=1).astype(np.float32)
        rot = np.stack([d[f"rot_{i}"] for i in range(4)], axis=1).astype(np.float32)
        opacity = np.asarray(d["opacity"], np.float32)[:, None]

        p = empty_params(self.capacity, self.max_sh_degree, seg.shape[1])
        idx = jnp.arange(n)
        self.params = GaussianParams(
            xyz=p.xyz.at[idx].set(xyz),
            features_dc=p.features_dc.at[idx, 0].set(f_dc),
            features_rest=p.features_rest.at[idx].set(f_rest),
            scaling=p.scaling.at[idx].set(scaling),
            rotation=p.rotation.at[idx].set(rot),
            opacity=p.opacity.at[idx].set(opacity),
            segment=p.segment.at[idx].set(seg),
        )
        self.aux = empty_aux(self.capacity)
        self.aux = self.aux._replace(alive=self.aux.alive.at[idx].set(True))
        self.active_sh_degree = self.max_sh_degree

    # --- full checkpoint (capture/restore, scene/gaussian_model.py:64-98) ----
    def capture(self) -> dict:
        state = {
            "active_sh_degree": self.active_sh_degree,
            "max_sh_degree": self.max_sh_degree,
            "num_class": self.num_class,
            "capacity": self.capacity,
            "spatial_lr_scale": self.spatial_lr_scale,
        }
        arrays = {}
        for k, v in self.params._asdict().items():
            arrays[f"params.{k}"] = np.asarray(v)
        for k, v in self.aux._asdict().items():
            arrays[f"aux.{k}"] = np.asarray(v)
        if self.opt_state is not None:
            arrays["opt.count"] = np.asarray(self.opt_state.count)
            for k, v in self.opt_state.mu._asdict().items():
                arrays[f"opt.mu.{k}"] = np.asarray(v)
            for k, v in self.opt_state.nu._asdict().items():
                arrays[f"opt.nu.{k}"] = np.asarray(v)
        return {"meta": state, "arrays": arrays}

    def save_checkpoint(self, path: str, iteration: int):
        cap = self.capture()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path, __iteration=iteration,
            __meta=np.array(repr(cap["meta"]), dtype=object), **cap["arrays"]
        )

    def restore_checkpoint(self, path: str) -> int:
        import ast
        z = np.load(path, allow_pickle=True)
        meta = ast.literal_eval(str(z["__meta"].item()))
        self.active_sh_degree = meta["active_sh_degree"]
        self.max_sh_degree = meta["max_sh_degree"]
        self.num_class = meta["num_class"]
        self.capacity = meta["capacity"]
        self.spatial_lr_scale = meta["spatial_lr_scale"]
        self.params = GaussianParams(**{
            k: jnp.asarray(z[f"params.{k}"]) for k in GaussianParams._fields})
        self.aux = GaussianAux(**{
            k: jnp.asarray(z[f"aux.{k}"]) for k in GaussianAux._fields})
        if "opt.count" in z:
            self.opt_state = adam.AdamState(
                count=jnp.asarray(z["opt.count"]),
                mu=GaussianParams(**{
                    k: jnp.asarray(z[f"opt.mu.{k}"]) for k in GaussianParams._fields}),
                nu=GaussianParams(**{
                    k: jnp.asarray(z[f"opt.nu.{k}"]) for k in GaussianParams._fields}),
            )
        return int(z["__iteration"])
