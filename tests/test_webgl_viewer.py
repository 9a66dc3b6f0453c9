"""Client-side WebGL2 viewer (viz/webgl_viewer.py): wire format, shader
math parity vs ops/preprocess, and HTTP endpoints.  N9 closure — the
interactive role of the reference's vendored SIBR_viewers desktop app,
delivered web-native (see webgl_viewer.py module docstring)."""
from __future__ import annotations

import json
import struct
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from helpers import make_camera


def _small_model(rng, n=64):
    from gsplat_tpu.models.gaussians import GaussianModel

    m = GaussianModel(2, num_class=2, capacity=128)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    m.create_from_pcd(pts, cols, 1.0)
    return m


def test_pack_unpack_roundtrip(rng):
    from gsplat_tpu.viz import webgl_viewer as wv

    m = _small_model(rng, n=50)
    buf = wv.pack_splats(m)
    pos, cov, rgba = wv.unpack_splats(buf)
    assert pos.shape == (50, 3) and cov.shape == (50, 6)
    assert rgba.shape == (50, 4) and rgba.dtype == np.uint8

    alive = np.asarray(m.aux.alive)
    sel = np.nonzero(alive)[0]
    np.testing.assert_allclose(pos, np.asarray(m.get_xyz)[sel], rtol=1e-6)

    # covariance equals R S S^T R^T built independently per splat
    scale = np.asarray(m.get_scaling)[sel]
    quat = np.asarray(m.get_rotation)[sel]
    for i in range(0, 50, 7):
        w, x, y, z = quat[i]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        S = (R * scale[i]) @ (R * scale[i]).T
        want = np.array([S[0, 0], S[0, 1], S[0, 2], S[1, 1], S[1, 2], S[2, 2]])
        np.testing.assert_allclose(cov[i], want, atol=1e-6)

    # color is the DC band through SH_C0, opacity through sigmoid
    dc = np.asarray(m.params.features_dc)[sel, 0]
    want_rgb = np.clip(wv.SH_C0 * dc + 0.5, 0, 1)
    np.testing.assert_allclose(rgba[:, :3] / 255.0, want_rgb, atol=1 / 255.0)
    want_a = np.clip(np.asarray(m.get_opacity)[sel, 0], 0, 1)
    np.testing.assert_allclose(rgba[:, 3] / 255.0, want_a, atol=1 / 255.0)


def test_bad_header_rejected():
    from gsplat_tpu.viz import webgl_viewer as wv

    with pytest.raises(ValueError):
        wv.unpack_splats(struct.pack("<IIII", 0xDEAD, 1, 0, 0))


def _shader_cov2d(pos, cov6, Vgl, fx, fy):
    """Numpy transcription of the VIEWER_HTML vertex shader's EWA path
    (GL convention: camera looks down -z, Vgl column-matrix)."""
    out = []
    for p, c6 in zip(pos, cov6):
        t = Vgl[:3, :3] @ p + Vgl[:3, 3]
        S = np.array([[c6[0], c6[1], c6[2]],
                      [c6[1], c6[3], c6[4]],
                      [c6[2], c6[4], c6[5]]])
        tz = t[2]
        J = np.array([[fx / tz, 0, -fx * t[0] / tz ** 2],
                      [0, fy / tz, -fy * t[1] / tz ** 2]])
        JW = J @ Vgl[:3, :3]
        C = JW @ S @ JW.T
        out.append([C[0, 0] + 0.3, C[0, 1], C[1, 1] + 0.3])
    return np.array(out)


def test_shader_cov2d_matches_preprocess(rng):
    """The client shader's EWA projection agrees with ops/preprocess
    compute_cov2d (reference forward.cu:74-113 math) up to the known
    GL-vs-screen frame change: x_gl-pixel and y_gl-pixel axes are a
    diag(-1,1) relabeling, so diagonals match and the off-diagonal term
    flips sign."""
    from gsplat_tpu.ops.preprocess import compute_cov2d

    n = 32
    # points well inside the frustum so the 1.3*tanfov clamp is inactive
    pos = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    pos[:, 2] += 3.0
    sc = rng.uniform(0.05, 0.3, size=(n, 3)).astype(np.float32)
    q = rng.standard_normal((n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    from gsplat_tpu.viz.webgl_viewer import _quat_to_rotmat

    R = _quat_to_rotmat(q)
    M = R * sc[:, None, :]
    cov = np.einsum("nij,nkj->nik", M, M)
    cov6 = np.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                     cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)

    # framework camera: identity view (row-vector convention), +z forward
    cam = make_camera(64, 48)
    V = np.asarray(cam.world_view_transform)  # [4,4] p_row @ V
    fx = 64 / (2 * np.tan(cam.FoVx / 2))
    fy = 48 / (2 * np.tan(cam.FoVy / 2))
    ours = np.asarray(compute_cov2d(
        pos, cov6, fx, fy, np.tan(cam.FoVx / 2), np.tan(cam.FoVy / 2), V))

    # GL view equivalent: column-matrix R_gl = F @ V[:3,:3]^T, F=diag(1,-1,-1)
    F = np.diag([1.0, -1.0, -1.0])
    Vgl = np.eye(4)
    Vgl[:3, :3] = F @ V[:3, :3].T
    Vgl[:3, 3] = F @ V[3, :3]
    theirs = _shader_cov2d(pos, cov6, Vgl, fx, fy)

    np.testing.assert_allclose(theirs[:, 0], ours[:, 0], rtol=2e-4)
    np.testing.assert_allclose(theirs[:, 2], ours[:, 2], rtol=2e-4)
    np.testing.assert_allclose(theirs[:, 1], -ours[:, 1],
                               rtol=2e-4, atol=1e-5)


def test_http_endpoints(rng, tmp_path):
    from gsplat_tpu.viz.render_app import RenderServer
    from gsplat_tpu.viz import webgl_viewer as wv

    m = _small_model(rng, n=40)
    cam = make_camera(48, 32)
    srv = RenderServer(m, cam, backend="jnp", scene_cams=[cam],
                       out_dir=str(tmp_path))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), srv.make_handler())
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        html = urllib.request.urlopen(f"{base}/viewer").read().decode()
        assert "webgl2" in html and "drawArraysInstanced" in html

        info = json.loads(
            urllib.request.urlopen(f"{base}/api/viewer-info").read())
        assert info["count"] == 40 and "fovy" in info and "extent" in info

        buf = urllib.request.urlopen(f"{base}/api/splats").read()
        pos, cov, rgba = wv.unpack_splats(buf)
        assert len(pos) == 40
    finally:
        httpd.shutdown()


def _simulate_client(buf, Vgl, fovy, W, H):
    """Numpy simulation of the full client pipeline: unpack -> per-splat
    EWA cov2d (VS math) -> screen-space gaussian alpha with the 3-sigma
    quad support and 1/255 discard (FS math) -> back-to-front
    premultiplied over-blend on black (the page's blend state)."""
    from gsplat_tpu.viz.webgl_viewer import unpack_splats

    pos, cov6, rgba = unpack_splats(buf)
    fy = H / (2 * np.tan(fovy / 2))
    fx = fy  # square pixels, like the page
    Rv, tv = Vgl[:3, :3], Vgl[:3, 3]
    t = pos @ Rv.T + tv
    vis = t[:, 2] < -0.05
    C = _shader_cov2d(pos, cov6, Vgl, fx, fy)        # [N,3] a,b,c
    # projection to pixel centers (page: persp + viewport map)
    ndc_x = fx * (-t[:, 0] / t[:, 2]) / (W / 2)
    ndc_y = fy * (-t[:, 1] / t[:, 2]) / (H / 2)
    px = (ndc_x * 0.5 + 0.5) * W
    py = (0.5 - ndc_y * 0.5) * H
    # J-space -> screen-pixel frame is diag(-1, 1) (see VS comment), so
    # b flips sign in screen space
    order = np.argsort(t[:, 2])   # most negative z = farthest drawn first
    img = np.zeros((H, W, 3))
    ys, xs = np.mgrid[0:H, 0:W]
    for i in order:
        if not vis[i]:
            continue
        a, b, c = C[i, 0], -C[i, 1], C[i, 2]
        det = a * c - b * b
        if det <= 0:
            continue
        ia, ib, ic = c / det, -b / det, a / det
        dx, dy = xs + 0.5 - px[i], ys + 0.5 - py[i]
        power = 0.5 * (ia * dx * dx + 2 * ib * dx * dy + ic * dy * dy)
        alpha = rgba[i, 3] / 255.0 * np.exp(-power)
        # quad support: |corner| <= 3 in the eigenbasis <=> power <= 9
        # along each axis; the page's quad bounds the ellipse at 3 sigma
        # per axis, conservatively approximated by the 3-sigma ellipse
        alpha = np.where(power <= 0.5 * 18.0, alpha, 0.0)
        alpha = np.where(alpha < 1.0 / 255.0, 0.0, alpha)
        col = rgba[i, :3] / 255.0
        img = col * alpha[..., None] + img * (1 - alpha[..., None])
    return img


def test_client_pipeline_matches_renderer(rng):
    """End to end: the simulated WebGL client reproduces the framework
    renderer's image (jnp backend, DC-only SH) on a sparse scene to a few
    least-significant bits, validating projection, sorting, alpha and
    blending of the page against the real rasterizer."""
    from gsplat_tpu.renderer import render

    m = _small_model(rng, n=30)
    cam = make_camera(64, 48)
    out = render(cam, m, bg_color=np.zeros(3, np.float32), backend="jnp",
                 max_instances=1 << 12)
    want = np.clip(np.asarray(out["render"]).transpose(1, 2, 0), 0, 1)

    from gsplat_tpu.viz.webgl_viewer import pack_splats

    buf = pack_splats(m)
    V = np.asarray(cam.world_view_transform)
    F = np.diag([1.0, -1.0, -1.0])
    Vgl = np.eye(4)
    Vgl[:3, :3] = F @ V[:3, :3].T
    Vgl[:3, 3] = F @ V[3, :3]
    got = _simulate_client(buf, Vgl, cam.FoVy, 64, 48)

    err = np.abs(got - want)
    assert err.mean() < 0.01, err.mean()
    assert np.percentile(err, 99) < 0.08, np.percentile(err, 99)
