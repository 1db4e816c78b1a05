"""Chunk-serialized row gather (ops/gather.py): the chunked path must be
bit-identical to a plain ``flat[idx]`` — padding, tail chunks, squeeze and
batched variants included. On CPU the default chunk short-circuits to
``take_along_axis``; passing a small explicit chunk forces the chunked
lowering so its semantics are covered by the suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_pose_tpu.ops.gather import gather_rows, gather_rows_batched


@pytest.mark.parametrize("n", [7, 64, 100, 129])
def test_gather_rows_chunked_matches_plain(n):
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (50, 5))
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 50)
    ref = np.asarray(flat)[np.asarray(idx)]
    for chunk in (16, 64, 1000):
        out = gather_rows(flat, idx, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_gather_rows_1d_squeeze():
    flat = jnp.arange(40.0)
    idx = jax.random.randint(jax.random.PRNGKey(2), (90,), 0, 40)
    out = gather_rows(flat, idx, chunk=32)
    assert out.shape == (90,)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(flat)[np.asarray(idx)])


def test_gather_rows_batched_matches_plain():
    flat = jax.random.normal(jax.random.PRNGKey(3), (3, 30, 4))
    idx = jax.random.randint(jax.random.PRNGKey(4), (3, 70), 0, 30)
    ref = jnp.take_along_axis(flat, idx[..., None], axis=1)
    out = gather_rows_batched(flat, idx, chunk=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_gather_rows_jit_and_grad():
    flat = jax.random.normal(jax.random.PRNGKey(5), (25, 3))
    idx = jax.random.randint(jax.random.PRNGKey(6), (60,), 0, 25)

    f = jax.jit(lambda t: gather_rows(t, idx, chunk=16).sum())
    g = jax.grad(lambda t: gather_rows(t, idx, chunk=16).sum())(flat)
    gref = jax.grad(lambda t: t[idx].sum())(flat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), rtol=0, atol=0)
    assert np.isfinite(float(f(flat)))
