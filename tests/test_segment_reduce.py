"""MXU segment-sum adjoint vs XLA scatter-add (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from gsplat_tpu.ops.segment_reduce import (
    gather_rows, segment_sum_sorted, BLOCK_G, CHUNK,
)


def test_segment_sum_sorted_matches_bincount(rng):
    I, P, R = 2048, 700, 16
    sids = np.sort(rng.integers(0, P, I)).astype(np.int32)
    vals = rng.standard_normal((I, R)).astype(np.float32)
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(sids), P, interpret=True))
    expected = np.zeros((P, R), np.float32)
    np.add.at(expected, sids, vals)
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_segment_sum_with_pad_ids(rng):
    I, P, R = 1024, 300, 16
    sids = np.sort(np.concatenate([
        rng.integers(0, P, I - 100), np.full(100, P)])).astype(np.int32)
    vals = rng.standard_normal((I, R)).astype(np.float32)
    out = np.asarray(segment_sum_sorted(
        jnp.asarray(vals), jnp.asarray(sids), P, interpret=True))
    expected = np.zeros((P, R), np.float32)
    np.add.at(expected, sids[sids < P], vals[sids < P])
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_gather_rows_grad_matches_scatter(rng):
    P, I, R = 500, 1536, 16
    table = jnp.asarray(rng.standard_normal((P, R)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, I).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((I, R)).astype(np.float32))

    def f_fast(t):
        return jnp.sum(gather_rows(t, idx, True) * cot)

    def f_ref(t):
        return jnp.sum(t[idx] * cot)

    g_fast = np.asarray(jax.grad(f_fast)(table))
    g_ref = np.asarray(jax.grad(f_ref)(table))
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-5, atol=1e-4)
