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


def test_bf16_pack_roundtrip(rng):
    from gsplat_tpu.ops.segment_reduce import (_pack_bf16_pairs,
                                               _unpack_bf16_pairs)
    for R in (10, 11):
        x = rng.standard_normal((256, R)).astype(np.float32) * 3.0
        packed = _pack_bf16_pairs(jnp.asarray(x))
        assert packed.shape == (256, (R + 1) // 2)
        back = np.asarray(_unpack_bf16_pairs(packed, R))
        # exact bf16 round-trip: values equal their bf16 rounding
        expected = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                              .astype(jnp.float32))
        np.testing.assert_array_equal(back, expected)


def test_gather_rows_grad_bf16_close(rng):
    """The bf16 packed-pair adjoint matches the f32 adjoint to bf16
    rounding (~0.4% relative on summed per-gaussian gradients)."""
    P, I, R = 500, 1536, 10
    table = jnp.asarray(rng.standard_normal((P, R)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, I).astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((I, R)).astype(np.float32))

    def f(t, prec):
        return jnp.sum(gather_rows(t, idx, True, prec) * cot)

    g32 = np.asarray(jax.grad(lambda t: f(t, "f32"))(table))
    g16 = np.asarray(jax.grad(lambda t: f(t, "bf16"))(table))
    err = np.abs(g16 - g32) / (np.abs(g32).max() + 1e-12)
    assert err.max() < 2e-2, err.max()
    # and it should NOT be identical (the rounding actually happened)
    assert not np.array_equal(g16, g32)
