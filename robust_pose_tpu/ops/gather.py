"""Fast row gather for TPU: chunk-serialized ``take_along_axis``.

XLA's TPU gather lowering degrades super-linearly with the query count:
one 1.6M-row gather runs at ~9 GB/s and a 2.6M-row batched gather at
~3 GB/s, while the SAME work split into <=64k-row gathers — serialized by
threading each chunk's indices through an ``optimization_barrier`` on the
previous chunk's output so XLA's gather-merging pass cannot re-batch
them — runs at ~60 GB/s (measured on v5e: 5.9 ms -> 0.9 ms for 1.6M x 32 B
rows; scripts/profile_warp4.py). Scatters do NOT benefit from the same
treatment (measured flat ~11 ms for 1.6M scatter-max updates).

This is the shared primitive behind the flow warps (ops/warp.py) and the
surfel-pool correspondence/render gathers (slam/surfel_map.py) — the two
hot gather sites of the tracking loops (reference analogues:
core/interpol/flow_utils.py grid_sample and core/fusion/surfel_map.py
fuse/render indexing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# <=64k-row chunks are on the fast path's plateau (scripts/profile_warp4.py:
# 100k and 50k chunks measure alike; 327k is already ~5x off)
_CHUNK = 65536


def gather_rows(flat: Array, idx: Array, chunk: int = _CHUNK) -> Array:
    """``flat[idx]`` row gather, chunk-serialized for TPU.

    :param flat: (M, C) or (M,) table
    :param idx: (N,) int32 row indices (caller guarantees 0 <= idx < M)
    :return: (N, C) or (N,) gathered rows
    """
    squeeze = flat.ndim == 1
    if squeeze:
        flat = flat[:, None]
    (n,) = idx.shape
    # CPU's gather lowering has no pathology — skip the chunking there
    # (unless a non-default chunk is passed, which tests use to exercise
    # the chunked path on the CPU backend)
    if n <= chunk or (chunk == _CHUNK and jax.default_backend() == "cpu"):
        out = jnp.take_along_axis(flat, idx[:, None], axis=0)
        return out[:, 0] if squeeze else out

    pad = (-n) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    outs = []
    for j in range(0, n + pad, chunk):
        ij = jax.lax.dynamic_slice_in_dim(idx, j, chunk)
        if outs:
            ij, _ = jax.lax.optimization_barrier((ij, outs[-1]))
        outs.append(jnp.take_along_axis(flat, ij[:, None], axis=0))
    out = jnp.concatenate(outs, axis=0)
    if pad:
        out = out[:n]
    return out[:, 0] if squeeze else out


def gather_rows_batched(flat: Array, idx: Array, chunk: int = _CHUNK) -> Array:
    """Per-sample ``gather_rows`` with the serialization chained ACROSS the
    batch too (a batched rank-3 gather is the slowest lowering of all).

    :param flat: (B, M, C)
    :param idx: (B, N) int32 row indices
    :return: (B, N, C)
    """
    if chunk == _CHUNK and jax.default_backend() == "cpu":
        return jnp.take_along_axis(flat, idx[..., None], axis=1)
    outs = []
    for b in range(flat.shape[0]):
        ib = idx[b]
        if outs:
            ib, _ = jax.lax.optimization_barrier((ib, outs[-1]))
        outs.append(gather_rows(flat[b], ib, chunk))
    return jnp.stack(outs)
