"""LPIPS numeric validation (VERDICT r1 item 7).

No official weights can exist in this image (no torchvision, no egress), so
the strongest available check: a synthetic checkpoint pair with the OFFICIAL
key schemas (torchvision VGG16 features.* + LPIPS lin{j}.model.1.weight) is
converted by tools/convert_lpips_weights.py and our JAX LPIPS must equal an
independent functional-torch implementation of the official LPIPS forward
(reference lpipsPyTorch/modules/lpips.py + networks.py semantics).
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo/tools")
from convert_lpips_weights import VGG16_FEATURE_CONV_IDX, convert  # noqa: E402

from gsplat_tpu.viz.lpips import LPIPS, VGG_CFG, SLICE_ENDS  # noqa: E402

CHANNELS = [c for c in VGG_CFG if c != "M"]


def _synth_state_dicts(rng):
    """(vgg_sd, lin_sd) with official keys/shapes, small random values."""
    vgg_sd, lin_sd = {}, {}
    cin = 3
    for fi, cout in zip(VGG16_FEATURE_CONV_IDX, CHANNELS):
        vgg_sd[f"features.{fi}.weight"] = torch.from_numpy(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.05)
        vgg_sd[f"features.{fi}.bias"] = torch.from_numpy(
            rng.standard_normal(cout).astype(np.float32) * 0.05)
        cin = cout
    for j, end in enumerate(SLICE_ENDS):
        c = CHANNELS[end - 1]
        lin_sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32))
    return vgg_sd, lin_sd


def _torch_lpips(vgg_sd, lin_sd, a, b):
    """Functional torch oracle of the official LPIPS 'vgg' forward:
    scaling layer -> VGG16 slices (relu1_2..relu5_3) -> unit-normalize ->
    squared diff -> 1x1 lin conv -> spatial mean -> sum over layers."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(x):
        h = (x * 2 - 1 - shift) / scale
        feats = []
        conv_i = 0
        for c in VGG_CFG:
            if c == "M":
                h = F.max_pool2d(h, 2, 2)
                continue
            fi = VGG16_FEATURE_CONV_IDX[conv_i]
            h = F.relu(F.conv2d(h, vgg_sd[f"features.{fi}.weight"],
                                vgg_sd[f"features.{fi}.bias"], padding=1))
            conv_i += 1
            if conv_i in SLICE_ENDS:
                feats.append(h)
        return feats

    total = torch.zeros(())
    for j, (f1, f2) in enumerate(zip(features(a), features(b))):
        n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
        n2 = f2 / (f2.norm(dim=1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2
        w = lin_sd[f"lin{j}.model.1.weight"]
        total = total + F.conv2d(d, w).mean()
    return float(total)


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(11)
    vgg_sd, lin_sd = _synth_state_dicts(rng)
    npz = convert(vgg_sd, lin_sd)
    path = tmp_path / "lpips_synth.npz"
    np.savez(path, **npz)

    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = _torch_lpips(vgg_sd, lin_sd,
                           torch.from_numpy(a)[None],
                           torch.from_numpy(b)[None])

    model = LPIPS(weights_path=str(path))
    ours = model(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-5)
    # sanity: identical images -> 0
    assert model(jnp.asarray(a), jnp.asarray(a)) == pytest.approx(0, abs=1e-7)


def _synth_alex_state_dicts(rng):
    sd, lin_sd = {}, {}
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    from convert_lpips_weights import ALEXNET_FEATURE_CONV_IDX
    for fi, shp in zip(ALEXNET_FEATURE_CONV_IDX, shapes):
        sd[f"features.{fi}.weight"] = torch.from_numpy(
            rng.standard_normal(shp).astype(np.float32) * 0.05)
        sd[f"features.{fi}.bias"] = torch.from_numpy(
            rng.standard_normal(shp[0]).astype(np.float32) * 0.05)
    for j, c in enumerate((64, 192, 384, 256, 256)):
        lin_sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32))
    return sd, lin_sd


def _torch_lpips_alex(sd, lin_sd, a, b):
    """Independent functional-torch oracle of the LPIPS 'alex' forward
    (reference networks.py:78-86: torchvision alexnet.features, slices
    after ReLUs at module indices 2,5,8,10,12)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(x):
        h = (x * 2 - 1 - shift) / scale
        w, bi = sd["features.0.weight"], sd["features.0.bias"]
        h = F.relu(F.conv2d(h, w, bi, stride=4, padding=2))
        f1 = h
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, sd["features.3.weight"],
                            sd["features.3.bias"], padding=2))
        f2 = h
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, sd["features.6.weight"],
                            sd["features.6.bias"], padding=1))
        f3 = h
        h = F.relu(F.conv2d(h, sd["features.8.weight"],
                            sd["features.8.bias"], padding=1))
        f4 = h
        h = F.relu(F.conv2d(h, sd["features.10.weight"],
                            sd["features.10.bias"], padding=1))
        return [f1, f2, f3, f4, h]

    total = torch.zeros(())
    for j, (f1, f2) in enumerate(zip(features(a), features(b))):
        n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
        n2 = f2 / (f2.norm(dim=1, keepdim=True) + 1e-10)
        total = total + torch.nn.functional.conv2d(
            (n1 - n2) ** 2, lin_sd[f"lin{j}.model.1.weight"]).mean()
    return float(total)


def test_lpips_alex_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(23)
    sd, lin_sd = _synth_alex_state_dicts(rng)
    npz = convert(sd, lin_sd, net="alex")
    path = tmp_path / "lpips_alex_synth.npz"
    np.savez(path, **npz)

    a = rng.uniform(0, 1, (3, 95, 83)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = _torch_lpips_alex(sd, lin_sd, torch.from_numpy(a)[None],
                                torch.from_numpy(b)[None])

    model = LPIPS(weights_path=str(path))
    assert model.net_type == "alex"
    ours = model(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-5)
    assert model(jnp.asarray(a), jnp.asarray(a)) == pytest.approx(0,
                                                                  abs=1e-7)


def _synth_squeeze_state_dicts(rng):
    sd, lin_sd = {}, {}

    def w(name, shp):
        sd[name + ".weight"] = torch.from_numpy(
            rng.standard_normal(shp).astype(np.float32) * 0.08)
        sd[name + ".bias"] = torch.from_numpy(
            rng.standard_normal(shp[0]).astype(np.float32) * 0.08)

    w("features.0", (64, 3, 3, 3))
    from convert_lpips_weights import SQUEEZE11_FIRE_IDX
    fire_cfg = [(64, 16, 64), (128, 16, 64), (128, 32, 128), (256, 32, 128),
                (256, 48, 192), (384, 48, 192), (384, 64, 256),
                (512, 64, 256)]
    for fi, (cin, s, e) in zip(SQUEEZE11_FIRE_IDX, fire_cfg):
        w(f"features.{fi}.squeeze", (s, cin, 1, 1))
        w(f"features.{fi}.expand1x1", (e, s, 1, 1))
        w(f"features.{fi}.expand3x3", (e, s, 3, 3))
    for j, c in enumerate((64, 128, 256, 384, 384, 512, 512)):
        lin_sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32))
    return sd, lin_sd


def _torch_lpips_squeeze(sd, lin_sd, a, b):
    """Oracle of LPIPS 'squeeze' (reference networks.py:66-74:
    squeezenet1_1.features with ceil-mode pools, slices at modules
    2,5,8,10,11,12,13)."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def fire(h, fi):
        sq = F.relu(F.conv2d(h, sd[f"features.{fi}.squeeze.weight"],
                             sd[f"features.{fi}.squeeze.bias"]))
        return torch.cat([
            F.relu(F.conv2d(sq, sd[f"features.{fi}.expand1x1.weight"],
                            sd[f"features.{fi}.expand1x1.bias"])),
            F.relu(F.conv2d(sq, sd[f"features.{fi}.expand3x3.weight"],
                            sd[f"features.{fi}.expand3x3.bias"],
                            padding=1))], dim=1)

    def features(x):
        h = (x * 2 - 1 - shift) / scale
        h = F.relu(F.conv2d(h, sd["features.0.weight"],
                            sd["features.0.bias"], stride=2))
        feats = [h]
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        h = fire(h, 3)
        h = fire(h, 4)
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        h = fire(h, 6)
        h = fire(h, 7)
        feats.append(h)
        h = F.max_pool2d(h, 3, 2, ceil_mode=True)
        for fi in (9, 10, 11, 12):
            h = fire(h, fi)
            feats.append(h)
        return feats

    total = torch.zeros(())
    for j, (f1, f2) in enumerate(zip(features(a), features(b))):
        n1 = f1 / (f1.norm(dim=1, keepdim=True) + 1e-10)
        n2 = f2 / (f2.norm(dim=1, keepdim=True) + 1e-10)
        total = total + torch.nn.functional.conv2d(
            (n1 - n2) ** 2, lin_sd[f"lin{j}.model.1.weight"]).mean()
    return float(total)


def test_lpips_squeeze_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(31)
    sd, lin_sd = _synth_squeeze_state_dicts(rng)
    npz = convert(sd, lin_sd, net="squeeze")
    path = tmp_path / "lpips_squeeze_synth.npz"
    np.savez(path, **npz)

    # odd size exercises the ceil-mode pooling edge
    a = rng.uniform(0, 1, (3, 77, 69)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    with torch.no_grad():
        ref = _torch_lpips_squeeze(sd, lin_sd, torch.from_numpy(a)[None],
                                   torch.from_numpy(b)[None])

    model = LPIPS(weights_path=str(path))
    assert model.net_type == "squeeze"
    ours = model(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-5)


def test_lpips_net_mismatch_raises(tmp_path):
    rng = np.random.default_rng(5)
    sd, lin_sd = _synth_alex_state_dicts(rng)
    path = tmp_path / "alex.npz"
    np.savez(path, **convert(sd, lin_sd, net="alex"))
    with pytest.raises(ValueError):
        LPIPS(weights_path=str(path), net_type="vgg")


def test_lpips_raises_without_weights(monkeypatch):
    monkeypatch.delenv("GSPLAT_LPIPS_WEIGHTS", raising=False)
    with pytest.raises(FileNotFoundError):
        LPIPS()
