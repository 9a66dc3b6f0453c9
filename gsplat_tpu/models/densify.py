"""Adaptive density control — clone / split / prune / opacity reset.

Behavioral spec: reference scene/gaussian_model.py:438-526 (densify_and_clone,
densify_and_split, densify_and_prune, add_densification_stats, reset_opacity)
and the train-loop schedule (train.py:169-180).

TPU-native redesign (SURVEY.md §7.1): parameters never change shape.  Clones
and splits are scattered into FREE SLOTS of the fixed-capacity arrays with
``mode='drop'`` overflow semantics; pruning just clears the alive mask and
parks the row (opacity -> -30 logit, xyz -> 1e8) so the rasterizer's frustum
and alpha tests skip it.  Selection masks are all computed from the state at
entry, which reproduces the reference's clone-then-split-then-prune ordering
exactly (clones never split in the same call because their grad stats are 0 —
gaussian_model.py:464-466 pads grads with zeros the same way).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core import transforms as T
from gsplat_tpu.models import adam
from gsplat_tpu.models.gaussians import (
    DEAD_OPACITY_LOGIT, DEAD_XYZ, GaussianAux, GaussianParams,
)


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # densify candidates lost to capacity overflow
    n_alive: jnp.ndarray


def add_densification_stats(aux: GaussianAux, grad_means2d_ndc: jnp.ndarray,
                            radii: jnp.ndarray) -> GaussianAux:
    """Accumulate screen-space positional gradient norms for visible gaussians
    and track max screen radius (train.py:171-172, gaussian_model.py:523-526).

    ``grad_means2d_ndc`` is the pixel-space mean2d gradient already rescaled by
    (0.5*W, 0.5*H) — the NDC units the 2e-4 threshold is calibrated for
    (backward.cu:627-628)."""
    vis = radii > 0
    gnorm = jnp.linalg.norm(grad_means2d_ndc[:, :2], axis=-1)
    return aux._replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(
            vis, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d),
    )


def _park_dead(params: GaussianParams, dead_mask) -> GaussianParams:
    m1 = dead_mask[:, None]
    return params._replace(
        xyz=jnp.where(m1, DEAD_XYZ, params.xyz),
        opacity=jnp.where(m1, DEAD_OPACITY_LOGIT, params.opacity),
    )


def _scatter_rows(tree, tgt, src_tree):
    """Write src rows to slot tgt[i] per source row i; tgt==capacity drops."""
    return jax.tree_util.tree_map(
        lambda x, s: x.at[tgt].set(s, mode="drop"), tree, src_tree
    )


@partial(jax.jit, static_argnames=("use_screen_size", "vs_prune"))
def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    opt_state: adam.AdamState,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent,
    max_screen_size,
    percent_dense: float,
    use_screen_size: bool,
    vs_prune: bool = False,
):
    C = params.xyz.shape[0]
    alive = aux.alive

    grads = jnp.where(aux.denom > 0, aux.xyz_gradient_accum / aux.denom, 0.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scaling = T.scaling_activation(params.scaling)
    max_scale = jnp.max(scaling, axis=1)
    grad_ok = alive & (grads >= max_grad)
    sel_clone = grad_ok & (max_scale <= percent_dense * extent)
    sel_split = grad_ok & (max_scale > percent_dense * extent)

    # Free-slot list: stable ascending sort of alive (False first).
    free_slots = jnp.argsort(alive)  # [C]
    n_free = C - jnp.sum(alive)

    # --- clone (gaussian_model.py:491-507): exact copies -------------------
    rank_c = jnp.cumsum(sel_clone) - 1
    n_clone = jnp.sum(sel_clone)
    ok_c = sel_clone & (rank_c < n_free)
    tgt_c = jnp.where(ok_c, free_slots[jnp.clip(rank_c, 0, C - 1)], C)
    params = _scatter_rows(params, tgt_c, params)

    # --- split (gaussian_model.py:461-489): N=2 samples from own gaussian --
    N = 2
    rank_s = jnp.cumsum(sel_split) - 1
    n_split = jnp.sum(sel_split)
    k1, k2 = jax.random.split(key)
    R = T.quat_to_rotmat(params.rotation)  # [C,3,3]
    new_scaling = jnp.log(scaling / (0.8 * N))

    def split_rows(k, which):
        samples = jax.random.normal(k, (C, 3)) * scaling
        new_xyz = jnp.einsum("cij,cj->ci", R, samples) + params.xyz
        src = params._replace(xyz=new_xyz, scaling=new_scaling)
        base = n_clone + N * rank_s + which
        ok = sel_split & (base < n_free)
        tgt = jnp.where(ok, free_slots[jnp.clip(base, 0, C - 1)], C)
        return tgt, src

    tgt_s1, src1 = split_rows(k1, 0)
    params = _scatter_rows(params, tgt_s1, src1)
    tgt_s2, src2 = split_rows(k2, 1)
    params = _scatter_rows(params, tgt_s2, src2)

    # new-slot bookkeeping
    newly = jnp.zeros((C,), bool)
    for tgt in (tgt_c, tgt_s1, tgt_s2):
        newly = newly.at[tgt].set(True, mode="drop")
    alive = alive | newly
    opt_state = adam.mask_rows(opt_state, params, newly)

    n_dropped = (
        jnp.sum(sel_clone & ~ (tgt_c < C))
        + jnp.sum(sel_split & ~(tgt_s1 < C))
        + jnp.sum(sel_split & ~(tgt_s2 < C))
    )

    # split originals are pruned (gaussian_model.py:485-488)
    prune = sel_split
    # opacity / size pruning (gaussian_model.py:507-519) on the updated set
    opacity = T.opacity_activation(params.opacity[:, 0])
    prune = prune | (alive & (opacity < min_opacity))
    if use_screen_size:
        # Reference-exact semantics (root-caused r5): densify_and_prune calls
        # clone -> densification_postfix and split -> densification_postfix
        # BEFORE computing the prune mask, and densification_postfix zeroes
        # max_radii2D for ALL points (gaussian_model.py:457-459).  So the
        # check ``big_points_vs = self.max_radii2D > max_screen_size``
        # (gaussian_model.py:516) always reads an all-zero tensor and NEVER
        # fires — the screen-radius prune is inert in the reference.  Only
        # the world-size prune (gaussian_model.py:517, scale > 0.1*extent)
        # is live.  Pruning on the accumulated radii instead (r2-r4
        # behavior, ``vs_prune=True`` below) mass-prunes near-camera wall
        # gaussians every 100 iterations once it > opacity_reset_interval
        # and was the actual cause of the closed-room "reset collapse"
        # (docs/QUALITY_r5_room_NOTES.md).
        big_ws = jnp.max(T.scaling_activation(params.scaling), axis=1) > 0.1 * extent
        prune = prune | (alive & big_ws)
        if vs_prune:  # debug/ablation arm only — NOT reference semantics
            big_vs = aux.max_radii2d > max_screen_size
            # newly created rows have max_radii2d == 0 -> never screen-pruned
            prune = prune | (alive & big_vs & ~newly)

    n_pruned = jnp.sum(prune & alive) - n_split  # excluding split originals
    alive = alive & ~prune
    params = _park_dead(params, ~alive)
    opt_state = adam.mask_rows(opt_state, params, ~alive)

    # densification_postfix resets all accumulators (gaussian_model.py:457-460)
    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((C,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((C,), jnp.float32),
        denom=jnp.zeros((C,), jnp.float32),
    )
    stats = DensifyStats(
        n_cloned=n_clone, n_split=n_split, n_pruned=n_pruned,
        n_dropped=n_dropped, n_alive=jnp.sum(alive),
    )
    return params, aux, opt_state, stats


@jax.jit
def reset_opacity(params: GaussianParams, aux: GaussianAux,
                  opt_state: adam.AdamState):
    """Clamp opacity to <= 0.01 and reset its Adam moments
    (gaussian_model.py:256-260 + replace_tensor_to_optimizer)."""
    op = T.opacity_activation(params.opacity)
    new_logit = T.inverse_sigmoid(jnp.minimum(op, 0.01))
    new_logit = jnp.where(aux.alive[:, None], new_logit, params.opacity)
    params = params._replace(opacity=new_logit)

    def zero_opacity(tree):
        return tree._replace(opacity=jnp.zeros_like(tree.opacity))

    opt_state = adam.AdamState(
        count=opt_state.count,
        mu=zero_opacity(opt_state.mu),
        nu=zero_opacity(opt_state.nu),
    )
    return params, opt_state
