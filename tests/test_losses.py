"""Loss-function parity tests vs torch reference implementations
(utils/loss_utils.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.train import losses as L


def test_ssim_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from math import exp

    img1 = rng.uniform(size=(3, 24, 32)).astype(np.float32)
    img2 = rng.uniform(size=(3, 24, 32)).astype(np.float32)

    # torch reference (loss_utils.py:110-150)
    def gaussian(window_size, sigma):
        g = torch.Tensor([exp(-(x - window_size // 2) ** 2 / (2 * sigma ** 2))
                          for x in range(window_size)])
        return g / g.sum()

    w1d = gaussian(11, 1.5).unsqueeze(1)
    w2d = w1d.mm(w1d.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
    t1 = torch.tensor(img1).unsqueeze(0)
    t2 = torch.tensor(img2).unsqueeze(0)
    mu1 = F.conv2d(t1, w2d, padding=5, groups=3)
    mu2 = F.conv2d(t2, w2d, padding=5, groups=3)
    s1 = F.conv2d(t1 * t1, w2d, padding=5, groups=3) - mu1 ** 2
    s2 = F.conv2d(t2 * t2, w2d, padding=5, groups=3) - mu2 ** 2
    s12 = F.conv2d(t1 * t2, w2d, padding=5, groups=3) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    expected = float(smap.mean())

    got = float(L.ssim(jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_segment_loss_matches_torch(rng):
    import torch
    logits = rng.standard_normal((5, 16, 20)).astype(np.float32)  # [C,H,W]
    labels = rng.integers(0, 5, (16, 20)).astype(np.int64)
    expected = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).unsqueeze(0), torch.tensor(labels).unsqueeze(0)))
    got = float(L.segment_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_localrf_depth_loss_matches_torch(rng):
    import torch
    dyn = rng.uniform(0.5, 5.0, (1, 16, 16)).astype(np.float32)
    gt = rng.uniform(0.5, 5.0, (1, 16, 16)).astype(np.float32)

    td = torch.tensor(dyn).view(1, -1)
    tg = torch.tensor(gt).view(1, -1)
    t_d = torch.median(td, dim=-1, keepdim=True).values
    s_d = torch.mean(torch.abs(td - t_d), dim=-1, keepdim=True)
    dn = (td - t_d) / s_d
    t_g = torch.median(tg, dim=-1, keepdim=True).values
    s_g = torch.mean(torch.abs(tg - t_g), dim=-1, keepdim=True)
    gn = (tg - t_g) / s_g
    arr = (dn - gn) ** 2
    arr[arr > torch.quantile(arr, 0.8, dim=1)[..., None]] = 0
    expected = float(arr.mean() * 0.1)

    got = float(L.compute_depth_loss(jnp.asarray(dyn), jnp.asarray(gt), 0.1))
    np.testing.assert_allclose(got, expected, rtol=2e-4)


def test_rank_and_continue_losses_finite(rng):
    key = jax.random.PRNGKey(0)
    dyn = jnp.asarray(rng.uniform(0.5, 5.0, (1, 32, 32)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0.5, 5.0, (1, 32, 32)).astype(np.float32))
    r = L.compute_rank_loss(key, dyn, gt, 0.2)
    c = L.compute_continue_loss(key, dyn, gt, 0.02)
    assert np.isfinite(float(r)) and float(r) >= 0
    assert np.isfinite(float(c)) and float(c) >= 0
    # rank loss of a perfectly-ordered pair set should be near the 1e-4 margin
    r_same = L.compute_rank_loss(key, gt, gt, 1.0)
    assert float(r_same) <= 1.1e-4


def test_depth_dispatch_all_choices(rng):
    from gsplat_tpu.config import OptimizationParams
    opt = OptimizationParams()
    key = jax.random.PRNGKey(1)
    depth = jnp.asarray(rng.uniform(0.1, 1.0, (24, 24)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0.1, 1.0, (1, 24, 24)).astype(np.float32))
    for choice in ["localrf", "rank_loss", "continue_loss", "hybrid_loss",
                   "L1_loss"]:
        v = float(L.depth_loss_dispatch(choice, key, depth, gt, opt))
        assert np.isfinite(v), choice


def test_psnr():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(L.psnr(a, b)), 20.0, atol=1e-4)
