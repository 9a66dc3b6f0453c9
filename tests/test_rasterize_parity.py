"""Tiled compositor vs naive oracle: forward + gradient parity
(SURVEY.md §4 test pyramid tier 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops import preprocess as pre_lib
from gsplat_tpu.ops.composite_ref import composite_reference
from gsplat_tpu.ops.rasterize import RasterizeConfig, rasterize

from helpers import cam_args, make_camera, make_gaussians


def _reference_render(g, cam, num_class=0, bg=None):
    bg = jnp.zeros(3) if bg is None else bg
    pre = pre_lib.preprocess(
        g["means3d"], g["scales"], g["rotations"], g["opacities"], g["shs"],
        3, **cam_args(cam), width=cam.image_width, height=cam.image_height,
    )
    return composite_reference(
        pre, cam.image_width, cam.image_height, bg,
        segments=g.get("segments"),
    )


@pytest.mark.parametrize("num_class", [0, 4])
def test_forward_parity(rng, num_class):
    cam = make_camera(64, 48)
    g = make_gaussians(rng, n=300, num_class=num_class)
    bg = jnp.array([0.2, 0.1, 0.4])

    ref = _reference_render(g, cam, num_class, bg)

    cfg = RasterizeConfig(width=64, height=48, num_class=num_class,
                          max_instances=1 << 14, k_max=512, backend="jnp")
    out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                    g["opacities"], g["shs"], **cam_args(cam), bg=bg,
                    segments=g.get("segments"))

    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(ref["alpha"]), atol=2e-5)
    if num_class:
        np.testing.assert_allclose(np.asarray(out["segment"]),
                                   np.asarray(ref["segment"]), atol=2e-5)
    assert not bool(out["overflow"])
    # Radii: non-zero for most gaussians in frustum
    assert int(jnp.sum(out["visibility"])) > 0


def test_opaque_occlusion_and_termination(rng):
    """Near-opaque front gaussian must terminate compositing behind it."""
    cam = make_camera(32, 32)
    n = 40
    g = make_gaussians(rng, n=n)
    # one big opaque gaussian in front (closer to camera => smaller z)
    means = np.asarray(g["means3d"]).copy()
    means[0] = [0.0, 0.0, -1.0]
    scales = np.asarray(g["scales"]).copy()
    scales[0] = [1.0, 1.0, 1.0]
    op = np.asarray(g["opacities"]).copy()
    op[0] = 0.999
    g["means3d"] = jnp.asarray(means)
    g["scales"] = jnp.asarray(scales)
    g["opacities"] = jnp.asarray(op)

    ref = _reference_render(g, cam)
    cfg = RasterizeConfig(width=32, height=32, max_instances=1 << 12,
                          k_max=256, backend="jnp")
    out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                    g["opacities"], g["shs"], **cam_args(cam),
                    bg=jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=2e-5)
    # center transmittance ~ 0 after repeated occlusion
    assert float(ref["T_final"][16, 16]) < 0.05


def test_gradient_parity(rng):
    """jax.grad through tiled path == jax.grad through oracle."""
    cam = make_camera(48, 32)
    g = make_gaussians(rng, n=150)
    bg = jnp.array([0.1, 0.2, 0.3])
    tgt = jnp.asarray(rng.uniform(size=(3, 32, 48)).astype(np.float32))

    cfg = RasterizeConfig(width=48, height=32, max_instances=1 << 13,
                          k_max=512, backend="jnp")

    def loss_tiled(params):
        out = rasterize(cfg, params["means3d"], params["scales"],
                        params["rotations"], params["opacities"], params["shs"],
                        **cam_args(cam), bg=bg)
        return jnp.mean((out["render"] - tgt) ** 2) + 0.1 * jnp.mean(out["depth"])

    def loss_ref(params):
        pre = pre_lib.preprocess(
            params["means3d"], params["scales"], params["rotations"],
            params["opacities"], params["shs"], 3, **cam_args(cam),
            width=48, height=32)
        ref = composite_reference(pre, 48, 32, bg)
        return jnp.mean((ref["render"] - tgt) ** 2) + 0.1 * jnp.mean(ref["depth"])

    params = {k: g[k] for k in ["means3d", "scales", "rotations", "opacities", "shs"]}
    g_tiled = jax.grad(loss_tiled)(params)
    g_ref = jax.grad(loss_ref)(params)
    for k in params:
        gt, gr = np.asarray(g_tiled[k]), np.asarray(g_ref[k])
        scale = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gt / scale, gr / scale, atol=5e-4,
                                   err_msg=f"grad mismatch for {k}")


def test_means2d_gradient_tap(rng):
    cam = make_camera(32, 32)
    g = make_gaussians(rng, n=50)
    cfg = RasterizeConfig(width=32, height=32, max_instances=1 << 12,
                          k_max=256, backend="jnp")
    off = jnp.zeros((50, 2))

    def loss(off):
        out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                        g["opacities"], g["shs"], **cam_args(cam),
                        bg=jnp.zeros(3), means2d_offset=off)
        return jnp.sum(out["render"] ** 2)

    grad = jax.grad(loss)(off)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0.0


def test_overflow_flag(rng):
    cam = make_camera(64, 64)
    g = make_gaussians(rng, n=500)
    cfg = RasterizeConfig(width=64, height=64, max_instances=64, k_max=64,
                          backend="jnp")
    out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                    g["opacities"], g["shs"], **cam_args(cam), bg=jnp.zeros(3))
    assert bool(out["overflow"])


def test_exact_cull_image_and_grad_parity(rng):
    """cull='exact' must not change rendered images (dropped instances are
    provably sub-1/255 alpha at every pixel of their tile) nor gradients
    (such instances receive exactly zero gradient in the full walk)."""
    cam = make_camera(96, 64)
    g = make_gaussians(rng, n=400)
    bg = jnp.array([0.15, 0.3, 0.1])

    def run(cull):
        cfg = RasterizeConfig(width=96, height=64, max_instances=1 << 14,
                              backend="pallas", cull=cull,
                              max_rows=1 << 12)

        def loss(g):
            out = rasterize(cfg, g["means3d"], g["scales"], g["rotations"],
                            g["opacities"], g["shs"], **cam_args(cam), bg=bg)
            return (jnp.sum(out["render"] ** 2) + jnp.sum(out["depth"])
                    + jnp.sum(out["alpha"] ** 2)), out
        (l, out), grads = jax.value_and_grad(loss, has_aux=True)(g)
        return l, out, grads

    l0, out0, g0 = run("none")
    l1, out1, g1 = run("exact")
    assert int(out1["num_rendered"]) < int(out0["num_rendered"])
    np.testing.assert_allclose(np.asarray(out0["render"]),
                               np.asarray(out1["render"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0["depth"]),
                               np.asarray(out1["depth"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out0["T_final"]),
                               np.asarray(out1["T_final"]),
                               rtol=1e-5, atol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=3e-3, atol=1e-3, err_msg=k)
        # (gradient tolerance: two rounding sources shift with the pad
        # positions the cull changes — the forward-walk suffix sum
        # TOT - prefix tail rounding (~eps*TOT), and the MXU pixel-moment
        # basis reconstruction whose condition number ~xk^2 amplifies
        # ulp-level dpow differences on large tile-relative means to ~1e-3
        # relative on conic/mean2d grads.  Both are below the bf16
        # grad-reduce rounding used in training and comparable to the CUDA
        # reference's nondeterministic atomicAdd ordering noise.  Absolute
        # correctness vs jax.grad of the oracle is asserted at 5e-6 in
        # test_tile_parallel.py::test_tile_sharded_grads_exact_vs_jax_grad
        # and test_grad_parity_* above; images above stay bit-equal.)


@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_render_only_matches_full(rng, backend):
    """render_only=True (deployed-renderer fast path): rgb must be bit-equal
    to the full config and alpha must equal the composited ones channel
    (alpha == 1 - T_final identically)."""
    cam = make_camera(64, 48)
    g = make_gaussians(rng, n=250)
    bg = jnp.array([0.1, 0.3, 0.2])

    base = dict(width=64, height=48, max_instances=1 << 14, k_max=512,
                backend=backend)
    full = rasterize(RasterizeConfig(**base), g["means3d"], g["scales"],
                     g["rotations"], g["opacities"], g["shs"],
                     **cam_args(cam), bg=bg)
    ro = rasterize(RasterizeConfig(render_only=True, **base), g["means3d"],
                   g["scales"], g["rotations"], g["opacities"], g["shs"],
                   **cam_args(cam), bg=bg)
    np.testing.assert_array_equal(np.asarray(ro["render"]),
                                  np.asarray(full["render"]))
    np.testing.assert_allclose(np.asarray(ro["alpha"]),
                               np.asarray(full["alpha"]), atol=1e-5)
    assert "depth" not in ro and "segment" not in ro
