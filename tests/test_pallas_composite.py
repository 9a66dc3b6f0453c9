"""Pallas composite kernels (interpret mode on CPU) vs oracle/jnp path:
forward parity + hand-derived VJP vs jax.grad (SURVEY.md §7.2 steps 3-4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops import preprocess as pre_lib
from gsplat_tpu.ops.composite_ref import composite_reference
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize

from helpers import cam_args, make_camera, make_gaussians


def _run(cfg, g, cam, bg, **kw):
    return rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                     g["opacities"], g["shs"], **cam_args(cam), bg=bg,
                     segments=g.get("segments"), **kw)


@pytest.mark.parametrize("num_class", [0, 3])
def test_pallas_forward_matches_oracle(rng, num_class):
    cam = make_camera(48, 32)
    g = make_gaussians(rng, n=200, num_class=num_class)
    bg = jnp.array([0.3, 0.2, 0.1])

    pre = pre_lib.preprocess(
        g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"],
        3, **cam_args(cam), width=48, height=32)
    ref = composite_reference(pre, 48, 32, bg, segments=g.get("segments"))

    cfg = RasterizeConfig(width=48, height=32, num_class=num_class,
                          max_instances=1 << 14, backend="pallas")
    out = _run(cfg, g, cam, bg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=3e-5)
    if num_class:
        np.testing.assert_allclose(np.asarray(out["segment"]),
                                   np.asarray(ref["segment"]), atol=3e-5)


def test_pallas_forward_multichunk(rng):
    """Force several 256-instance chunks per tile (tests the DMA loop and
    cross-chunk carries)."""
    cam = make_camera(32, 32)
    # >1024 instances even when the whole image is a single tile (the
    # 32x32 default) so the per-tile chunk loop really iterates
    n = 1300
    g = make_gaussians(rng, n=n, spread=0.6)
    # make gaussians big enough that many overlap every tile, low opacity so
    # compositing doesn't terminate early
    g["scales"] = jnp.asarray(np.full((n, 3), 0.3, np.float32))
    g["opacities"] = jnp.asarray(np.full(n, 0.02, np.float32))
    bg = jnp.array([0.5, 0.5, 0.5])

    cfg_j = RasterizeConfig(width=32, height=32, max_instances=1 << 15,
                            k_max=2048, backend="jnp")
    cfg_p = RasterizeConfig(width=32, height=32, max_instances=1 << 15,
                            backend="pallas")
    out_j = _run(cfg_j, g, cam, bg)
    out_p = _run(cfg_p, g, cam, bg)
    assert int(out_p["num_rendered"]) > 1024  # really multi-chunk
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_j["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_p["alpha"]),
                               np.asarray(out_j["alpha"]), atol=3e-5)


def test_pallas_gradients_match_jnp_path(rng):
    cam = make_camera(48, 32)
    g = make_gaussians(rng, n=150)
    bg = jnp.array([0.1, 0.2, 0.3])
    tgt = jnp.asarray(rng.uniform(size=(3, 32, 48)).astype(np.float32))
    params = {k: g[k] for k in ["means3d", "scales", "rotations",
                                "opacities", "shs"]}

    def make_loss(cfg):
        def loss(p):
            out = rasterize(cfg, p["means3d"], p["scales"], p["rotations"],
                            p["opacities"], p["shs"], **cam_args(cam), bg=bg)
            return (jnp.mean((out["render"] - tgt) ** 2)
                    + 0.05 * jnp.mean(out["depth"])
                    + 0.02 * jnp.mean(out["alpha"]))
        return loss

    cfg_j = RasterizeConfig(width=48, height=32, max_instances=1 << 13,
                            k_max=512, backend="jnp")
    cfg_p = RasterizeConfig(width=48, height=32, max_instances=1 << 13,
                            backend="pallas")
    g_j = jax.grad(make_loss(cfg_j))(params)
    g_p = jax.grad(make_loss(cfg_p))(params)
    for k in params:
        a, b = np.asarray(g_p[k]), np.asarray(g_j[k])
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3,
                                   err_msg=f"pallas grad mismatch for {k}")


def test_pallas_gradients_multichunk_termination(rng):
    """Gradient parity in the regime with multiple chunks AND early
    termination (opaque front gaussians)."""
    cam = make_camera(32, 32)
    g = make_gaussians(rng, n=600, spread=0.5)
    # anisotropic so rotation gradients are real, not fp noise
    g["scales"] = jnp.asarray(
        (np.array([0.3, 0.12, 0.2], np.float32)[None]
         * np.exp(rng.standard_normal((600, 3)).astype(np.float32) * 0.2)))
    op = np.full(600, 0.4, np.float32)
    op[:50] = 0.97  # opaque layer triggers termination
    g["opacities"] = jnp.asarray(op)
    bg = jnp.zeros(3)
    tgt = jnp.asarray(rng.uniform(size=(3, 32, 32)).astype(np.float32))
    params = {k: g[k] for k in ["means3d", "scales", "rotations",
                                "opacities", "shs"]}

    def make_loss(cfg):
        def loss(p):
            out = rasterize(cfg, p["means3d"], p["scales"], p["rotations"],
                            p["opacities"], p["shs"], **cam_args(cam), bg=bg)
            return jnp.mean(jnp.abs(out["render"] - tgt))
        return loss

    cfg_j = RasterizeConfig(width=32, height=32, max_instances=1 << 15,
                            k_max=2048, backend="jnp")
    cfg_p = RasterizeConfig(width=32, height=32, max_instances=1 << 15,
                            backend="pallas")
    g_j = jax.grad(make_loss(cfg_j))(params)
    g_p = jax.grad(make_loss(cfg_p))(params)
    for k in params:
        a, b = np.asarray(g_p[k]), np.asarray(g_j[k])
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                   err_msg=f"grad mismatch for {k}")


def test_mxu_power_forward_and_grad_parity(rng):
    """mxu_power=True (quadratic form as a tile-relative basis matmul on the
    MXU) must match the VPU elementwise path closely in both the image and
    the input gradients — the tile-relative formulation bounds the matmul's
    cancellation error to ~1e-5 in power at 16x16 (see _chunk_alpha
    docstring).  The px^2/px*py basis magnitudes scale with TILE_X^2, so
    the absolute power rounding (and hence the image tolerance) scales
    with (TILE_X/16)^2 — at the 32x16 default that is 4x."""
    from gsplat_tpu.ops.preprocess import TILE_X
    cam = make_camera(64, 48)
    g = make_gaussians(rng, n=300)
    bg = jnp.array([0.2, 0.4, 0.1])
    tt = (TILE_X / 16.0) ** 2

    base = dict(width=64, height=48, max_instances=1 << 14, backend="pallas")
    out_v = _run(RasterizeConfig(**base), g, cam, bg)
    out_m = _run(RasterizeConfig(mxu_power=True, **base), g, cam, bg)
    np.testing.assert_allclose(np.asarray(out_m["render"]),
                               np.asarray(out_v["render"]), atol=5e-5 * tt)
    np.testing.assert_allclose(np.asarray(out_m["depth"]),
                               np.asarray(out_v["depth"]), atol=5e-4 * tt)

    def loss(means3d, opac, cfg):
        out = rasterize(cfg, means3d, g["scales"], g["rotations"], opac,
                        g["shs"], **cam_args(cam), bg=bg)
        return jnp.sum(out["render"] * jnp.cos(out["render"])) + \
            0.3 * jnp.sum(out["depth"])

    gv = jax.grad(loss, argnums=(0, 1))(
        g["means3d"], g["opacities"], RasterizeConfig(**base))
    gm = jax.grad(loss, argnums=(0, 1))(
        g["means3d"], g["opacities"], RasterizeConfig(mxu_power=True, **base))
    for a, b in zip(gm, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_feat_precision_bf16_close_to_f32(rng):
    """feat_precision="bf16" packs the feature table columns as bf16 pairs
    (8-column gather class): image within bf16 rounding of the f32 path,
    input gradients within the packed-cotangent rounding."""
    import jax

    from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize
    from helpers import cam_args, make_camera, make_gaussians

    cam = make_camera(64, 48)
    g = make_gaussians(rng, n=150)
    bg = jnp.array([0.2, 0.1, 0.3])

    outs = {}
    for fp in ("f32", "bf16"):
        cfg = RasterizeConfig(width=64, height=48, max_instances=1 << 13,
                              backend="pallas", feat_precision=fp)

        def loss(g):
            out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                            g["opacities"], g["shs"], **cam_args(cam),
                            bg=bg)
            return (jnp.sum(out["render"] ** 2)
                    + 0.1 * jnp.sum(out["depth"])), out
        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(g)
        outs[fp] = (out, grads)

    o0, g0 = outs["f32"]
    o1, g1 = outs["bf16"]
    # image: features rounded to bf16 (0.4% relative)
    np.testing.assert_allclose(np.asarray(o1["render"]),
                               np.asarray(o0["render"]),
                               atol=6e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(o1["depth"]),
                               np.asarray(o0["depth"]),
                               atol=6e-2, rtol=1e-2)
    # alpha/T_final only see geometry (f32) — bit-equal
    np.testing.assert_array_equal(np.asarray(o1["T_final"]),
                                  np.asarray(o0["T_final"]))
    for k in g0:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2,
                                   err_msg=f"grad {k}")
