"""COLMAP binary parsers (python + native C++) on synthetic .bin files."""
import struct

import numpy as np
import pytest

from gsplat_tpu.data import colmap, native


def _write_cameras_bin(path, cams):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, model_id, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cid, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))


def _write_images_bin(path, imgs):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(imgs)))
        for iid, qvec, tvec, cam_id, name, pts in imgs:
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<7d", *qvec, *tvec))
            f.write(struct.pack("<i", cam_id))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(pts)))
            for x, y, pid in pts:
                f.write(struct.pack("<ddq", x, y, pid))


def _write_points3d_bin(path, pts):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for pid, xyz, rgb, err, track in pts:
            f.write(struct.pack("<q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", err))
            f.write(struct.pack("<Q", len(track)))
            for a, b in track:
                f.write(struct.pack("<ii", a, b))


@pytest.fixture
def colmap_model(tmp_path, rng):
    cams = [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0])]
    imgs = [
        (1, [1, 0, 0, 0], [0, 0, 1], 1, "img_001.jpg",
         [(10.5, 20.5, 7), (30.0, 40.0, -1)]),
        (2, [0.9, 0.1, 0.2, 0.3], [1, 2, 3], 1, "img_002.jpg", []),
    ]
    pts = [
        (7, [1.0, 2.0, 3.0], [255, 128, 0], 0.5, [(1, 0)]),
        (9, [-1.0, 0.5, 2.5], [10, 20, 30], 1.5, [(1, 1), (2, 0)]),
    ]
    _write_cameras_bin(tmp_path / "cameras.bin", cams)
    _write_images_bin(tmp_path / "images.bin", imgs)
    _write_points3d_bin(tmp_path / "points3D.bin", pts)
    return tmp_path


def test_read_intrinsics_binary(colmap_model):
    cams = colmap.read_intrinsics_binary(str(colmap_model / "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])


def test_read_extrinsics_binary(colmap_model):
    imgs = colmap.read_extrinsics_binary(str(colmap_model / "images.bin"))
    assert imgs[1].name == "img_001.jpg"
    np.testing.assert_allclose(imgs[1].tvec, [0, 0, 1])
    np.testing.assert_allclose(imgs[1].xys, [[10.5, 20.5], [30.0, 40.0]])
    np.testing.assert_allclose(imgs[2].qvec, [0.9, 0.1, 0.2, 0.3])


def test_read_points3d_binary_python_and_native(colmap_model):
    xyz, rgb, err = colmap.read_points3D_binary(
        str(colmap_model / "points3D.bin"))
    np.testing.assert_allclose(xyz, [[1, 2, 3], [-1, 0.5, 2.5]])
    np.testing.assert_allclose(rgb, [[255, 128, 0], [10, 20, 30]])
    np.testing.assert_allclose(err.ravel(), [0.5, 1.5])

    if native.available():
        out = native.read_points3d_binary(str(colmap_model / "points3D.bin"))
        assert out is not None
        np.testing.assert_allclose(out[0], xyz, atol=1e-6)
        np.testing.assert_allclose(out[1], rgb)


def test_native_images_meta(colmap_model):
    if not native.available():
        pytest.skip("native lib not built")
    out = native.read_images_binary_meta(str(colmap_model / "images.bin"))
    assert out is not None
    ids, qvec, tvec, cam_ids, names = out
    assert list(ids) == [1, 2]
    assert names == ["img_001.jpg", "img_002.jpg"]
    np.testing.assert_allclose(tvec[1], [1, 2, 3])


def test_qvec_roundtrip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_extrinsics_text_roundtrip_empty_points(tmp_path):
    """write_extrinsics_text emits an EMPTY POINTS2D line per image (legal
    COLMAP for images with no track observations); the reader must keep the
    two-line pairing instead of collapsing blank lines (regression: the
    quality-scene generator's images.txt failed to parse)."""
    import numpy as np
    from gsplat_tpu.data import colmap as colmap_lib

    imgs = {}
    for i in (1, 2, 3):
        q = np.array([1.0, 0.0, 0.0, 0.0])
        t = np.array([0.1 * i, -0.2, 3.0])
        imgs[i] = colmap_lib.ColmapImage(
            id=i, qvec=q, tvec=t, camera_id=1, name=f"im_{i}.png",
            xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, int))
    path = tmp_path / "images.txt"
    colmap_lib.write_extrinsics_text(str(path), imgs)
    back = colmap_lib.read_extrinsics_text(str(path))
    assert sorted(back) == [1, 2, 3]
    for i in (1, 2, 3):
        np.testing.assert_allclose(back[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(back[i].tvec, imgs[i].tvec)
        assert back[i].name == f"im_{i}.png"
        assert back[i].xys.shape == (0, 2)
