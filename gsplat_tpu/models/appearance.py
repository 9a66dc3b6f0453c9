"""Per-camera appearance embedding — TPU-native replacement for the
reference's tiny-cuda-nn module (gaussian_renderer/__init__.py:112-199).

Architecture parity: 16-dim learned per-camera embedding concatenated with
the flattened 4x4 view matrix (32 inputs) -> Frequency(4) sin/cos encoding
(256 dims) -> MLP 2 hidden layers of 32, ReLU, Sigmoid output -> 3 RGB
factors multiplied into the rendered image.  Own Adam(lr=1e-4, eps=1e-15).
Implemented with plain jax pytrees (fused trivially by XLA — a FullyFusedMLP
is just what the MXU does anyway).
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.models import adam

N_FREQ = 4
EMB_DIM = 16
IN_DIM = 32
HIDDEN = 32


class AppearanceParams(NamedTuple):
    emb: jnp.ndarray        # [num_cameras, 16]
    w0: jnp.ndarray         # [enc, 32]
    b0: jnp.ndarray
    w1: jnp.ndarray         # [32, 32]
    b1: jnp.ndarray
    w2: jnp.ndarray         # [32, 3]
    b2: jnp.ndarray


def frequency_encoding(x, n_freq: int = N_FREQ):
    """tiny-cuda-nn 'Frequency' encoding: sin/cos(2^i * pi * x)."""
    freqs = (2.0 ** jnp.arange(n_freq)) * jnp.pi
    ang = x[..., None] * freqs  # [..., D, F]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(x.shape[:-1] + (-1,))


def init_params(num_cameras: int, key=None) -> AppearanceParams:
    key = key if key is not None else jax.random.PRNGKey(1337)
    ks = jax.random.split(key, 3)
    enc_dim = IN_DIM * 2 * N_FREQ

    def glorot(k, fan_in, fan_out):
        lim = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(k, (fan_in, fan_out), minval=-lim, maxval=lim)

    return AppearanceParams(
        emb=jnp.zeros((num_cameras, EMB_DIM)),
        w0=glorot(ks[0], enc_dim, HIDDEN), b0=jnp.zeros(HIDDEN),
        w1=glorot(ks[1], HIDDEN, HIDDEN), b1=jnp.zeros(HIDDEN),
        w2=glorot(ks[2], HIDDEN, 3), b2=jnp.zeros(3),
    )


def apply(params: AppearanceParams, cam_uid, viewmatrix):
    """-> [3] RGB appearance factors for one camera."""
    emb = params.emb[cam_uid]
    x = jnp.concatenate([emb, viewmatrix.reshape(-1)])
    h = frequency_encoding(x)
    h = jax.nn.relu(h @ params.w0 + params.b0)
    h = jax.nn.relu(h @ params.w1 + params.b1)
    return jax.nn.sigmoid(h @ params.w2 + params.b2)


class AppearanceOptimizer:
    """Host container mirroring the reference class's API."""

    def __init__(self, num_cameras: int, lr: float = 1e-4):
        self.num_cameras = num_cameras
        self.lr = lr
        self.params = init_params(num_cameras)
        self.opt_state = adam.init(self.params)
        print("using appearance embedding!")

    def __call__(self, viewpoint_cam):
        return apply(self.params, viewpoint_cam.uid,
                     jnp.asarray(viewpoint_cam.world_view_transform))

    def update(self, grads):
        lrs = jax.tree_util.tree_map(lambda _: self.lr, self.params)
        self.params, self.opt_state = adam.update(
            grads, self.opt_state, self.params, lrs)

    def save(self, path: str, with_opt: bool = False):
        """Model state beside the PLY (reference save_appearance_embedding,
        gaussian_renderer/__init__.py:163-170); ``with_opt`` additionally
        captures Adam moments for exact training resume (the reference's
        .ckpt stores model state only)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays = {k: np.asarray(v) for k, v in self.params._asdict().items()}
        if with_opt:
            arrays["opt_count"] = np.asarray(self.opt_state.count)
            for k, v in self.opt_state.mu._asdict().items():
                arrays[f"mu_{k}"] = np.asarray(v)
            for k, v in self.opt_state.nu._asdict().items():
                arrays[f"nu_{k}"] = np.asarray(v)
        np.savez(path, **arrays)

    def load(self, path: str) -> bool:
        if not os.path.exists(path):
            print("disable appearance embedding")
            return False
        z = np.load(path)
        self.params = AppearanceParams(
            **{k: jnp.asarray(z[k]) for k in AppearanceParams._fields})
        if "opt_count" in z.files:
            self.opt_state = adam.AdamState(
                count=jnp.asarray(z["opt_count"]),
                mu=AppearanceParams(**{k: jnp.asarray(z[f"mu_{k}"])
                                       for k in AppearanceParams._fields}),
                nu=AppearanceParams(**{k: jnp.asarray(z[f"nu_{k}"])
                                       for k in AppearanceParams._fields}))
        else:
            self.opt_state = adam.init(self.params)
        return True
