"""Surfel map: point-based fusion and frame rendering (Keller'13 style).

TPU-native rebuild of reference core/fusion/surfel_map.py:14-313. The
reference grows/shrinks tensors dynamically every frame (cat/boolean-index,
surfel_map.py:140-157) — impossible under XLA's static shapes. Here the map
is a **fixed-capacity slot pool**: every op (fuse, prune, append, render) is a
masked gather/scatter over static arrays, so the whole fusion step jits into
one compiled region and the map stays resident in HBM.

Append strategy: new points are compacted into a contiguous block (one
int32 index scatter + one packed gather — measured 2.7 ms vs 43 ms for
per-point scatters on v5e) and written at the ``hi`` high-water mark with a
single ``dynamic_update_slice``. Pruned slots become inactive HOLES that are
NOT backfilled (TPU scatters serialize; hole-backfill cost ~16x the block
write); a separate ``surfel_compact`` pass re-packs the active prefix and is
invoked by the host wrapper only when fragmentation warrants it. The arrays
carry an N-row scratch margin past ``capacity`` so the block write never
clamps. Overflow drops lowest-priority new points and is reported via
``n_dropped`` (the reference would instead grow without bound —
surfel_map.py:140-143; the ``SurfelMap`` wrapper makes overflow lossless by
compacting/growing and re-running the pure fuse).

Capacity bucketing: every fuse/render pass costs O(pool size), so the
``SurfelMap`` wrapper keeps the arrays at a small capacity bucket (2x frame,
doubling on demand up to ``capacity``) instead of allocating the worst case
up front — the pool passes then scale with LIVE surfels, which is what makes
frame-to-model tracking real-time (VERDICT r2 item 1).

Render strategy: the reference sorts by confidence so higher-confidence
surfels overwrite earlier writes (surfel_map.py:242-254). XLA scatter order
with duplicate indices is undefined, so we make the winner explicit: a
scatter-max of a (conf, slot)-packed key picks a unique per-pixel winner,
then only winners write depth/rgb.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from robust_pose_tpu import se3
from robust_pose_tpu.ops.gather import gather_rows
from robust_pose_tpu.ops.geometry import create_img_coords, project2image
from robust_pose_tpu.slam.frame import Frame, make_frame

Array = jax.Array


class SurfelConfig(NamedTuple):
    capacity: int
    img_shape: Tuple[int, int]        # (H, W)
    conf_thr: float = 7.0             # reference surfel_map.py:22
    t_max: int = 15                   # reference surfel_map.py:23
    d_thresh: float = 100.0           # reference surfel_map.py:25
    average_pts: bool = True          # reference surfel_map.py:30
    exact_render: bool = True         # True: exact two-pass per-pixel winner
    # argmax (bit-identical to max-confidence-wins). False: single-pass
    # packed-key scatter-max — confidence ties are resolved at 2^-conf_bits
    # granularity (slot id breaks near-ties), 3x faster on TPU; the
    # reference's own tie order is sort-arbitrary (surfel_map.py:242-254).
    winner: str = "scatter"           # packed-winner primitive: "scatter"
    # (one scatter-max over the pool), "sort" (lax.sort by (pixel, key) +
    # unique per-segment-tail set), or "segsort" (double-sort segment
    # pipeline: sort candidates, compact the per-pixel segment tails with a
    # second 1-key sort, then ONE n-row unique+sorted set — no pool-sized
    # scatter anywhere). All bit-identical. On v5e the duplicate-combining
    # scatter-max serializes per update row (~7 ns/row) while the bitonic
    # sorter moves the same 1.6M rows in ~2.5 ms, so "segsort" wins the
    # production f2m shapes (scripts/profile_winner_prims.py); "sort"
    # loses only because its tail write is itself a pool-sized scatter.
    upscale: int = 1                  # fuse-time correspondence supersampling
    # (reference surfel_map.py:24,86-93: the frame is bilinearly upsampled and
    # the intrinsics scaled so surfel<->pixel matching happens on a u-times
    # finer grid — fewer quantization collisions; appended points stay at
    # base resolution. The reference instantiates it only with 1,
    # pose_estimator.py:75; its u>1 path also carries latent indexing bugs
    # this rebuild does not reproduce.)


class SurfelState(NamedTuple):
    opts: Array       # (CAP, 3) world-space points
    rgb: Array        # (CAP, 3)
    conf: Array       # (CAP,)
    t_created: Array  # (CAP,) int32
    active: Array     # (CAP,) bool
    tick: Array       # () int32
    pmat: Array       # (7,) map extrinsics
    n_dropped: Array  # () int32 — appends lost to capacity overflow
    hi: Array         # () int32 — 1 + max active slot index (prefix extent)


def _seg_kmax(pix: Array, key: Array, n: int) -> Array:
    """Per-pixel max of ``key`` via the double-sort segment pipeline
    (``pix == n`` drops); -1 where a pixel has no candidate.

    1. sort candidates by (pix, key): each pixel's segment tail is its max
    2. compact the tails to the front, ordered by pixel, with a second
       1-key sort (non-tails get the ``n`` sentinel and sink to the back)
    3. the first n rows hold every present pixel exactly once, sorted —
       ONE n-row unique+sorted set writes the image

    Replaces the pool-sized scatter-max: TPU scatter combines duplicate
    indices one update row at a time (~7 ns/row = 9-12 ms at the production
    1.6M-row pool) while two bitonic sorts of the same rows cost ~5 ms
    (scripts/profile_winner_prims.py measurements, v5e).
    """
    ps, ks = jax.lax.sort((pix, key), num_keys=2, is_stable=False)
    is_tail = jnp.concatenate([ps[1:] != ps[:-1], jnp.ones((1,), bool)])
    skey = jnp.where(is_tail, ps, n)  # non-tails and pix==n both -> sentinel
    sp, sw = jax.lax.sort((skey, ks), num_keys=1, is_stable=False)
    return jnp.full((n,), -1, jnp.int32).at[sp[:n]].set(
        sw[:n], mode="drop", unique_indices=True, indices_are_sorted=True)


def _seg_covered(pix: Array, flag: Array, n: int) -> Array:
    """Per-pixel OR of ``flag`` (i32 0/1) over candidates, scatter-free.

    Packs the flag into the key's LSB: within a pixel's segment all rows
    share ``pix << 1``, so the segment max's LSB is exactly the OR. One
    1-operand sort + the same tail-compaction sort as ``_seg_kmax``.
    ``pix`` must already be clipped in-bounds (the coverage pass clips).
    """
    packed = (pix << 1) | flag
    s = jax.lax.sort(packed, is_stable=False)
    pp = s >> 1
    is_tail = jnp.concatenate([pp[1:] != pp[:-1], jnp.ones((1,), bool)])
    comp = jnp.where(is_tail, s, (n << 1) | 1)  # sentinel: pixel n, dropped
    s2 = jax.lax.sort(comp, is_stable=False)[:n]
    return jnp.zeros((n,), jnp.int32).at[s2 >> 1].set(
        s2 & 1, mode="drop", unique_indices=True,
        indices_are_sorted=True) > 0


def _winner_kmax(pix: Array, key: Array, n: int, cfg: SurfelConfig) -> Array:
    """Per-pixel max of ``key`` over candidates (``pix == n`` drops).

    "scatter": one scatter-max. "sort": lexicographic (pix, key) sort; the
    tail of each pixel segment holds its max, written with a unique-index
    set. "segsort": double-sort segment pipeline (``_seg_kmax``) — no
    pool-sized scatter at all. Bit-identical outputs (the packed key embeds
    the slot id, so maxima are unique); which primitive is faster is
    hardware-dependent.
    """
    if cfg.winner == "segsort":
        return _seg_kmax(pix, key, n)
    if cfg.winner == "sort":
        ps, ks = jax.lax.sort((pix, key), num_keys=2)
        is_last = jnp.concatenate([ps[1:] != ps[:-1], jnp.ones((1,), bool)])
        idx = jnp.where(is_last, ps, n)
        return jnp.full((n,), -1, jnp.int32).at[idx].set(
            ks, mode="drop", unique_indices=True)
    return jnp.full((n,), -1, jnp.int32).at[pix].max(key, mode="drop")


def _frame_world_points(frame: Frame, kmat: Array, pose: Array,
                        img_coords: Array) -> Array:
    """Back-project the frame depth and move to world coords. -> (N, 3)"""
    depth = frame.depth.reshape(-1, 1)
    kinv = jnp.linalg.inv(kmat)
    rays = jnp.matmul(img_coords, kinv.T,
                      precision=jax.lax.Precision.HIGHEST)  # (N, 3)
    return se3.act(pose[None], depth * rays)


def surfel_create(frame: Frame, kmat: Array, cfg: SurfelConfig,
                  pmat: Optional[Array] = None) -> SurfelState:
    """Initialize the map from a frame (reference surfel_map.py:47-64)."""
    h, w = cfg.img_shape
    n = h * w
    assert cfg.capacity >= n, "surfel capacity must hold at least one frame"
    img_coords = create_img_coords(h, w)
    pmat = se3.identity(()) if pmat is None else pmat

    opts = _frame_world_points(frame, kmat, pmat, img_coords)
    rgb = frame.img.reshape(-1, 3)
    conf = frame.confidence.reshape(-1) / cfg.conf_thr
    mask = frame.mask.reshape(-1)

    # alloc = capacity + one frame of scratch margin: the fused append is a
    # dynamic_update_slice of an N-row block at ``hi`` (hi <= capacity), so
    # the write never clamps against the array end
    alloc = cfg.capacity + n
    pad = alloc - n
    state = SurfelState(
        opts=jnp.pad(opts, ((0, pad), (0, 0))),
        rgb=jnp.pad(rgb, ((0, pad), (0, 0))),
        conf=jnp.pad(conf, (0, pad)),
        t_created=jnp.zeros((alloc,), jnp.int32),
        active=jnp.pad(mask, (0, pad)),
        tick=jnp.zeros((), jnp.int32),
        pmat=pmat,
        n_dropped=jnp.zeros((), jnp.int32),
        hi=jnp.asarray(n, jnp.int32),
    )
    return state


def surfel_pad(state: SurfelState, cfg: SurfelConfig) -> SurfelState:
    """Grow the pool arrays to ``cfg.capacity`` slots + scratch margin
    (bucket promotion). Pure zero-padding — slot indices and therefore
    test-visible ordering are preserved."""
    h, w = cfg.img_shape
    alloc = cfg.capacity + h * w
    cur = state.opts.shape[0]
    pad = alloc - cur
    assert pad >= 0
    return state._replace(
        opts=jnp.pad(state.opts, ((0, pad), (0, 0))),
        rgb=jnp.pad(state.rgb, ((0, pad), (0, 0))),
        conf=jnp.pad(state.conf, (0, pad)),
        t_created=jnp.pad(state.t_created, (0, pad)),
        active=jnp.pad(state.active, (0, pad)),
    )


def surfel_compact(state: SurfelState, cfg: SurfelConfig) -> SurfelState:
    """Re-pack active surfels into a contiguous low-index prefix (stable
    order) and reset ``hi`` to the live count. One int32 rank scatter + one
    packed gather over the pool (~20 ms at 2x-frame buckets on v5e) —
    host-invoked only when fragmentation warrants it, NOT per fuse."""
    alloc = state.opts.shape[0]
    act = state.active
    rank = jnp.cumsum(act) - 1
    n_live = rank[-1] + 1
    ids = jnp.arange(alloc, dtype=jnp.int32)
    src = jnp.zeros((alloc,), jnp.int32).at[
        jnp.where(act, rank, alloc)].set(ids, mode="drop",
                                         unique_indices=True)
    rows = jnp.concatenate(
        [state.opts, state.rgb, state.conf[:, None],
         state.t_created.astype(state.opts.dtype)[:, None]], axis=-1)
    packed = gather_rows(rows, src)
    live = ids < n_live
    return state._replace(
        opts=jnp.where(live[:, None], packed[:, :3], 0.0),
        rgb=jnp.where(live[:, None], packed[:, 3:6], 0.0),
        conf=jnp.where(live, packed[:, 6], 0.0),
        t_created=jnp.where(live, packed[:, 7].astype(jnp.int32), 0),
        active=live,
        hi=n_live.astype(jnp.int32),
    )


def _fuse_core(state: SurfelState, frame: Frame, pose: Array, kmat: Array,
               cfg: SurfelConfig, with_winner: bool = False):
    """Shared fuse body; returns (new_state, aux) where aux carries the
    pool projection and append-block bookkeeping so ``surfel_fuse_render``
    can reuse them for the next frame's rendering (same transform, same
    points when ``average_pts`` is off).

    With ``with_winner`` (the merged fuse+render path, packed-scatter
    winner config) the render's pool-winner scatter-max runs here next to
    the fuse's ``covered`` scatter as a SEPARATE 1-column pass, and the
    winner image lands in aux["pool_kmax"] for ``surfel_fuse_render`` to
    extend with the appended-block candidates via an N-update scatter
    (2.16 ms) instead of riding an alloc+N concat into one big scatter.
    NOT fused into one 2-column windowed scatter: on v5e the (N, 2)
    windowed scatter-max lowers ~3x slower than two independent 1-column
    passes (65.5 vs 22.4 ms at a 4-frame bucket — TPU scatter serializes
    per update row, and the 2-element update window triples the per-row
    cost; scripts/profile_render_decomp.py, device-time rows)."""
    h, w = cfg.img_shape
    n = h * w
    u = cfg.upscale
    img_coords = create_img_coords(h, w)

    # frame points in world coordinates (reference surfel_map.py:93-97)
    opts_new = _frame_world_points(frame, kmat, pose, img_coords)  # (N, 3)
    rgb_new = frame.img.reshape(-1, 3)
    fmask = frame.mask.reshape(-1)
    conf_new = jnp.full((n,), 1.0 / cfg.conf_thr, state.conf.dtype)

    pose_inv = se3.inv(pose)
    if u > 1:
        # supersampled correspondence grid (reference surfel_map.py:86-93):
        # bilinearly upsampled frame + u-scaled intrinsics; matching happens
        # on the fine grid, appended points stay at base resolution
        hf, wf, nf = h * u, w * u, h * w * u * u
        kf = kmat * jnp.array([[u], [u], [1.0]])
        depth_f = jax.image.resize(frame.depth, (1, hf, wf, 1), "linear")
        rgb_f = jax.image.resize(frame.img, (1, hf, wf, 3), "linear")
        mask_f = jax.image.resize(frame.mask.astype(jnp.float32),
                                  (1, hf, wf, 1), "nearest") > 0.5
        fine = frame.replace(img=rgb_f, depth=depth_f, mask=mask_f)
        opts_fine = _frame_world_points(fine, kf, pose,
                                        create_img_coords(hf, wf))
        rgb_fine = rgb_f.reshape(-1, 3)
        fmask_fine = mask_f.reshape(-1)
        ipts, inb = project2image(state.opts[None], kf[None], (hf, wf),
                                  pose_inv[None])
    else:
        hf, wf, nf = h, w, n
        opts_fine, rgb_fine, fmask_fine = opts_new, rgb_new, fmask
        # project all surfels into the current image (surfel_map.py:103-107)
        ipts, inb = project2image(state.opts[None], kmat[None], (h, w),
                                  pose_inv[None])
    ipts = ipts[0]  # (CAP, 3)
    bidx = inb[0] & state.active
    # match by pixel quantization (get_match_indices, surfel_map.py:165-179)
    qx = jnp.round(ipts[:, 0] - 0.5).astype(jnp.int32)
    qy = jnp.round(ipts[:, 1] - 0.5).astype(jnp.int32)
    midx = jnp.clip(qy * wf + qx, 0, nf - 1)

    # ONE packed gather of the per-surfel frame correspondence rows
    # (opts 3 + rgb 3 + mask 1 — gather passes over the pool dominate)
    frame_rows = jnp.concatenate(
        [opts_fine, rgb_fine,
         fmask_fine[:, None].astype(opts_fine.dtype)], axis=-1)  # (NF, 7)
    corr = gather_rows(frame_rows, midx)                         # (CAP, 7)
    opts_corr = corr[:, :3]
    rgb_corr = corr[:, 3:6]
    fmask_corr = corr[:, 6] > 0

    # depth-outlier rejection in world z (filter_surfels_by_correspondence,
    # surfel_map.py:181-203 — the reference compares world-frame z values)
    depth_ok = jnp.abs(opts_corr[:, 2] - state.opts[:, 2]) < cfg.d_thresh
    matched = bidx & depth_ok & fmask_corr

    # confidence-weighted running average (surfel_map.py:117-125)
    alloc = state.opts.shape[0]
    ccor = jnp.full((alloc,), 1.0 / cfg.conf_thr, state.conf.dtype)
    cold = state.conf
    denom = jnp.maximum(cold + ccor, 1e-12)
    if cfg.average_pts:
        opts_upd = (cold[:, None] * state.opts + ccor[:, None] * opts_corr) / denom[:, None]
        rgb_upd = (cold[:, None] * state.rgb + ccor[:, None] * rgb_corr) / denom[:, None]
        opts = jnp.where(matched[:, None], opts_upd, state.opts)
        rgb = jnp.where(matched[:, None], rgb_upd, state.rgb)
    else:
        opts, rgb = state.opts, state.rgb
    conf = jnp.where(matched, jnp.clip(cold + ccor, 0.0, 1.0), cold)

    tick = state.tick + 1

    # prune unstable aged surfels (remove_surfels_by_confidence_and_time,
    # surfel_map.py:150-158) — computed BEFORE the coverage scatter so the
    # fused covered+winner pass below can embed the post-fuse validity
    age = tick - state.t_created
    keep = state.active & ((conf >= 1.0) | (age < cfg.t_max))

    # pixels already covered by a matched surfel (surfel_map.py:127-133);
    # for u > 1 the fine-grid coverage max-pools back to the base grid
    # (reference surfel_map.py:131-133)
    if cfg.winner == "segsort":
        # double-sort segment OR: two 1-operand bitonic sorts + one n-row
        # unique set, ~2.3x the throughput of the pool-sized scatter-max
        # on v5e (scripts/profile_winner_prims.py)
        covered_f = _seg_covered(midx, matched.astype(jnp.int32), nf)
    elif cfg.winner == "sort":
        covered_f = _winner_kmax(midx, matched.astype(jnp.int32), nf,
                                 cfg) > 0
    else:
        # i32 scatter-max: the bool-operand scatter lowering is ~45%
        # slower on v5e (16.0 vs 11.1 ms at a 1.6M-slot pool — scripts/
        # profile_device.py --stage prims); identical result
        covered_f = jnp.zeros((nf,), jnp.int32).at[midx].max(
            matched.astype(jnp.int32), mode="drop") > 0
    if u > 1:
        covered = covered_f.reshape(h, u, w, u).any(axis=(1, 3)).reshape(-1)
    else:
        covered = covered_f
    new_mask = ~covered & fmask

    # pool winner for the merged fuse+render path: its own 1-column
    # scatter-max (see docstring — fusing it into the coverage scatter as
    # a 2-column window measures 3x SLOWER on v5e)
    slot_bits = max(int(state.opts.shape[0] - 1).bit_length(), 1)
    pool_kmax = None
    if (with_winner and cfg.winner in ("scatter", "segsort")
            and not cfg.exact_render and slot_bits <= 23 and u == 1):
        alloc_ = state.opts.shape[0]
        slot_ids = jnp.arange(alloc_, dtype=jnp.int32)
        px = jnp.clip(ipts[:, 0].astype(jnp.int32), 0, w - 1)
        py = jnp.clip(ipts[:, 1].astype(jnp.int32), 0, h - 1)
        idx = jnp.where(inb[0], py * w + px, n)  # n -> dropped
        vrender = inb[0] & keep & (slot_ids < state.hi)
        conf_bits = 31 - slot_bits
        qmax = (1 << conf_bits) - 1
        q = jnp.clip((conf * qmax).astype(jnp.int32), 0, qmax)
        key = jnp.where(vrender, (q << slot_bits) | slot_ids, -1)
        if cfg.winner == "segsort":
            pool_kmax = _seg_kmax(idx, key, n)
        else:
            pool_kmax = jnp.full((n,), -1, jnp.int32).at[idx].max(
                key, mode="drop")

    # append-at-hi: compact the new points into a contiguous block (one
    # int32 rank scatter + one packed gather) and write it at the high-water
    # mark with a single dynamic_update_slice. Pruned slots become inactive
    # holes (NOT backfilled — per-point f32 scatters serialize on TPU and
    # cost ~16x this formulation; surfel_compact re-packs when needed).
    rank = jnp.cumsum(new_mask) - 1                # rank among new points
    n_new = rank[-1] + 1
    space = jnp.maximum(cfg.capacity - state.hi, 0)
    n_placed = jnp.minimum(n_new, space)
    placed = new_mask & (rank < space)
    src = jnp.zeros((n,), jnp.int32).at[
        jnp.where(placed, rank, n)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop",
            unique_indices=True)
    block = gather_rows(jnp.concatenate(
        [opts_new, rgb_new, conf_new[:, None]], axis=-1), src)  # (N, 7)
    row_ids = jnp.arange(n, dtype=jnp.int32)
    blk_active = row_ids < n_placed

    hi0 = state.hi
    opts = jax.lax.dynamic_update_slice(opts, block[:, :3], (hi0, 0))
    rgb = jax.lax.dynamic_update_slice(rgb, block[:, 3:6], (hi0, 0))
    conf = jax.lax.dynamic_update_slice(conf, block[:, 6], (hi0,))
    t_created = jax.lax.dynamic_update_slice(
        state.t_created, jnp.full((n,), tick, jnp.int32) * blk_active, (hi0,))
    active = jax.lax.dynamic_update_slice(keep, blk_active, (hi0,))

    n_dropped = state.n_dropped + (n_new - n_placed)
    hi = hi0 + n_placed
    new_state = SurfelState(opts, rgb, conf, t_created, active, tick,
                            state.pmat, n_dropped, hi)
    aux = dict(ipts=ipts, inb=inb[0], src=src, blk_active=blk_active,
               placed=placed, rank=rank,
               hi0=hi0, u=u)
    if pool_kmax is not None:
        aux["pool_kmax"] = pool_kmax
    return new_state, aux


def surfel_fuse(state: SurfelState, frame: Frame, pose: Array, kmat: Array,
                cfg: SurfelConfig) -> SurfelState:
    """Fuse one frame into the map (reference surfel_map.py:73-148).

    :param pose: (7,) camera-to-world pose of the frame
    """
    new_state, _ = _fuse_core(state, frame, pose, kmat, cfg)
    return new_state


def surfel_fuse_render(state: SurfelState, frame: Frame, pose: Array,
                       kmat: Array, cfg: SurfelConfig
                       ) -> Tuple[SurfelState, Frame]:
    """Fuse one frame AND render the post-fuse map at ``inv(pose)`` — the
    exact reference view the NEXT frame-to-model step tracks against
    (reference get_pose_f2m: transform_cpy(last_pose.inv()) + render,
    pose_estimator.py:127-133, where last_pose is this frame's ``pose``).

    With ``average_pts`` off (the production SCARED config,
    configuration/infer_scared.yaml) fuse does not move existing points, so
    the render can REUSE the fuse's own pool projection (same points, same
    transform) instead of paying a second full-pool projection pass; the
    appended block's projections are analytic (each new point projects back
    to its own source pixel). Requires cfg.average_pts == False and
    cfg.upscale == 1; bit-identical to ``surfel_render(surfel_fuse(...))``.
    """
    assert not cfg.average_pts and cfg.upscale == 1, (
        "surfel_fuse_render requires average_pts=False, upscale=1")
    h, w = cfg.img_shape
    n = h * w
    new_state, aux = _fuse_core(state, frame, pose, kmat, cfg,
                                with_winner=True)
    alloc = new_state.opts.shape[0]
    slot_ids = jnp.arange(alloc, dtype=jnp.int32)

    # pool-slot candidates: the fuse's projection at inv(pose) IS the render
    # projection (surfel_render quantization: floor to pixel, n -> dropped)
    ipts = aux["ipts"]
    # post-fuse active/conf for slots BELOW the append mark; appended rows
    # are handled separately (their projections are analytic)
    below = slot_ids < aux["hi0"]
    valid = aux["inb"] & new_state.active & below
    px = jnp.clip(ipts[:, 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(ipts[:, 1].astype(jnp.int32), 0, h - 1)
    pix = jnp.where(valid, py * w + px, n)

    slot_bits = max(int(alloc - 1).bit_length(), 1)
    conf_bits = 31 - slot_bits
    qmax = (1 << conf_bits) - 1

    def pack(conf_v, ids, ok):
        q = jnp.clip((conf_v * qmax).astype(jnp.int32), 0, qmax)
        return jnp.where(ok, (q << slot_bits) | ids, -1)

    # appended-block conf rows are CONTIGUOUS at hi0 — a dynamic slice, not
    # a gather (conf has an N-row scratch margin past capacity >= hi0)
    blk_ids = aux["hi0"] + jnp.arange(n, dtype=jnp.int32)
    blk_conf_rows = jax.lax.dynamic_slice_in_dim(
        new_state.conf, aux["hi0"], n)
    if cfg.exact_render or slot_bits > 23:
        # exact two-pass winner over the union of pool + appended candidates
        blk_pix = jnp.where(aux["blk_active"], aux["src"], n)
        conf_max = jnp.full((n,), -jnp.inf).at[pix].max(
            new_state.conf, mode="drop")
        conf_max = conf_max.at[blk_pix].max(blk_conf_rows, mode="drop")
        pixc = jnp.clip(pix, 0, n - 1)
        is_max = valid & (new_state.conf == conf_max[pixc])
        cand = jnp.where(is_max, slot_ids, -1)
        slot_img = jnp.full((n,), -1, jnp.int32).at[pix].max(cand, mode="drop")
        bpixc = jnp.clip(blk_pix, 0, n - 1)
        bis_max = aux["blk_active"] & (blk_conf_rows == conf_max[bpixc])
        bcand = jnp.where(bis_max, blk_ids, -1)
        slot_img = slot_img.at[blk_pix].max(bcand, mode="drop")
    else:
        # appended block: row j landed at slot hi0+j and projects back to its
        # own source pixel src-inverse; blk row j's pixel is the j-th placed
        # new point's pixel = aux['src'][j]
        if "pool_kmax" in aux:
            # the full-pool winner pass already ran inside _fuse_core
            # (reusing its projection/validity); only the appended block's
            # candidates remain — and those need NO scatter at all: block
            # row j is the j-th placed frame pixel, so in PIXEL space the
            # block's key image is elementwise-computable (every fresh
            # append has the constant conf 1/conf_thr; its slot id is
            # hi0 + rank[p]); the extension is one jnp.maximum (replaces a
            # 2.1 ms N-row scatter-max, scripts/profile_winner_prims.py)
            q_new = jnp.clip(
                (jnp.asarray(1.0 / cfg.conf_thr, new_state.conf.dtype)
                 * qmax).astype(jnp.int32), 0, qmax)
            blk_img = jnp.where(
                aux["placed"],
                (q_new << slot_bits) | (aux["hi0"] + aux["rank"]), -1)
            kmax = jnp.maximum(aux["pool_kmax"], blk_img)
        else:
            blk_key = pack(blk_conf_rows, blk_ids, aux["blk_active"])
            blk_pix = jnp.where(aux["blk_active"], aux["src"], n)
            key = pack(new_state.conf, slot_ids, valid)
            kmax = _winner_kmax(jnp.concatenate([pix, blk_pix]),
                                jnp.concatenate([key, blk_key]), n, cfg)
        slot_img = jnp.where(kmax >= 0, kmax & ((1 << slot_bits) - 1), -1)

    have = slot_img >= 0
    sl = jnp.clip(slot_img, 0, alloc - 1)
    # winner payloads in ONE packed chunked gather (N pixel rows)
    win = gather_rows(jnp.concatenate(
        [new_state.opts, new_state.rgb, new_state.conf[:, None]], axis=-1),
        sl)
    conf_img = jnp.where(have, win[:, 6], 0.0)
    T = se3.inv(pose)
    zcam = se3.act(T[None], win[:, :3])[:, 2]
    depth_img = jnp.where(have, zcam, 0.0)
    rgb_img = jnp.where(have[:, None], win[:, 3:6], 0.0)
    model_frame = make_frame(
        rgb_img.reshape(1, h, w, 3), depth=depth_img.reshape(1, h, w, 1),
        mask=have.reshape(1, h, w, 1),
        confidence=conf_img.reshape(1, h, w, 1))
    return new_state, model_frame


def surfel_transform(state: SurfelState, tr: Array) -> SurfelState:
    """Rigidly transform all surfels (reference surfel_map.py:205-219)."""
    return state._replace(opts=se3.act(tr[None], state.opts))


def surfel_render(state: SurfelState, kmat: Array, cfg: SurfelConfig,
                  extrinsics: Optional[Array] = None) -> Frame:
    """Render (image, depth, mask, confidence) from the map
    (reference surfel_map.py:230-264), confidence-aware z-splat."""
    h, w = cfg.img_shape
    n = h * w
    alloc = state.opts.shape[0]
    T = state.pmat if extrinsics is None else extrinsics

    ipts, inb = project2image(state.opts[None], kmat[None], (h, w), T[None])
    ipts = ipts[0]  # (ALLOC, 3)
    valid = inb[0] & state.active
    px = jnp.clip(ipts[:, 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(ipts[:, 1].astype(jnp.int32), 0, h - 1)
    pix = jnp.where(valid, py * w + px, n)  # n -> dropped
    slot_ids = jnp.arange(alloc, dtype=jnp.int32)

    slot_bits = max(int(alloc - 1).bit_length(), 1)
    if cfg.exact_render or slot_bits > 23:
        # unique per-pixel winner, exact two-pass argmax: (1) scatter-max
        # the confidence, (2) among conf-equal candidates scatter-max the
        # slot id. (A float-packed conf+slot*eps key either overwhelms
        # genuine confidence differences at large capacities or underflows
        # f32 eps — see VERDICT r1.)
        conf_max = jnp.full((n,), -jnp.inf).at[pix].max(state.conf,
                                                        mode="drop")
        pixc = jnp.clip(pix, 0, n - 1)
        is_max = valid & (state.conf == conf_max[pixc])
        cand = jnp.where(is_max, slot_ids, -1)
        slot_img = jnp.full((n,), -1, jnp.int32).at[pix].max(cand,
                                                             mode="drop")
    else:
        # single-pass packed winner (3x faster: ONE scatter-max instead of
        # two + a gather): i32 key = quantized conf in the high bits | slot
        # id in the low bits. Winner selection granularity is 2^-conf_bits
        # in confidence (>= 8 bits; conf is clipped to [0, 1] by fuse) —
        # near-ties resolve by slot id, which matches the reference's
        # sort-arbitrary tie order (surfel_map.py:242-254).
        conf_bits = 31 - slot_bits
        qmax = (1 << conf_bits) - 1
        q = jnp.clip((state.conf * qmax).astype(jnp.int32), 0, qmax)
        key = jnp.where(valid, (q << slot_bits) | slot_ids, -1)
        kmax = _winner_kmax(pix, key, n, cfg)
        slot_img = jnp.where(kmax >= 0, kmax & ((1 << slot_bits) - 1), -1)

    # the winner slot per pixel is now known, so depth/rgb/conf come from
    # per-PIXEL gathers (N) instead of per-SLOT scatters (ALLOC) — the pool
    # passes are the f2m bottleneck (VERDICT r2 item 1); one packed chunked
    # gather fetches all winner payloads
    have = slot_img >= 0
    sl = jnp.clip(slot_img, 0, alloc - 1)
    win = gather_rows(jnp.concatenate(
        [state.opts, state.rgb, state.conf[:, None]], axis=-1), sl)
    conf_img = jnp.where(have, win[:, 6], 0.0)
    # camera-frame depth for the rendered frame (winners only)
    zcam = se3.act(T[None], win[:, :3])[:, 2]
    depth_img = jnp.where(have, zcam, 0.0)
    rgb_img = jnp.where(have[:, None], win[:, 3:6], 0.0)

    mask = have.reshape(1, h, w, 1)
    # NOTE the reference pipes depth/colors through SparseImgInterpolator
    # here (surfel_map.py:256,262) — but it zero-fills the splat images and
    # the interpolator only replaces NaN pixels (sparse_img_interpolation.py
    # :25-31), so the inpainting is a no-op on this path. Reproducing the
    # quirk exactly means NOT paying the 5x5 depthwise conv: holes stay 0
    # and ``mask`` carries validity, identical to the reference output.
    depth = depth_img.reshape(1, h, w, 1)
    colors = rgb_img.reshape(1, h, w, 3)
    return make_frame(colors, depth=depth, mask=mask,
                      confidence=conf_img.reshape(1, h, w, 1))


def stable_points(state: SurfelState) -> Array:
    """Mask of stable surfels (conf >= 1, reference surfel_map.py:286-290)."""
    return state.active & (state.conf >= 1.0)


class SurfelMap:
    """Host-side convenience wrapper mirroring the reference class API
    (fuse / render / transform_cpy / save_ply) over the jitted functions.

    The pool arrays live at a small capacity BUCKET (2x frame, doubling on
    demand up to ``capacity``), so every fuse/render pass scales with live
    surfels rather than the configured worst case. Overflow inside a bucket
    is lossless: the pure fuse is re-run from the pre-fuse state at the next
    bucket. Only at the hard ``capacity`` limit do appends drop — counted in
    ``n_dropped`` and warned about ONCE (the reference instead grows without
    bound, surfel_map.py:140-143)."""

    def __init__(self, frame: Frame, kmat, config: Optional[dict] = None,
                 pmat=None, capacity: Optional[int] = None,
                 depth_scale: float = 1.0):
        config = config or {}
        h, w = frame.shape
        self._n = h * w
        self.max_capacity = capacity or 8 * h * w
        self._cfg_kw = dict(
            img_shape=(h, w),
            d_thresh=config.get("dist_thr", 100.0),
            average_pts=config.get("average_pts", True),
            exact_render=bool(config.get("exact_render", True)),
            winner=str(config.get("winner", "scatter")),
            upscale=int(config.get("upscale", 1)),
        )
        # initial_bucket pre-sizes the pool (skips growth recompiles on
        # sequences whose surfel count is known to reach it); default
        # starts small (2x frame) and doubles on demand
        bucket = int(config.get("initial_bucket") or
                     max(min(self.max_capacity, 2 * self._n), self._n))
        bucket = max(min(bucket, self.max_capacity), self._n)
        self.cfg = SurfelConfig(capacity=bucket, **self._cfg_kw)
        self.kmat = jnp.asarray(kmat, jnp.float32)
        self.depth_scale = depth_scale
        self._warned_overflow = False
        pm = None if pmat is None else jnp.asarray(pmat, jnp.float32).reshape(7)
        self.state = jax.jit(surfel_create, static_argnums=2)(
            frame, self.kmat, self.cfg, pm
        )
        self._fuse = jax.jit(surfel_fuse, static_argnums=4)
        self._render = jax.jit(surfel_render, static_argnums=2)
        self._transform = jax.jit(surfel_transform)
        self._compact = jax.jit(surfel_compact, static_argnums=1)
        # host-side upper bound on state.hi (each fuse appends <= one frame
        # of points): lets post_fuse SKIP its blocking counter readback —
        # a per-frame device->host sync — while the bucket provably has
        # headroom; refreshed from real counters whenever it can't
        self._hi_upper = self._n

    def _grow(self) -> None:
        self.cfg = self.cfg._replace(
            capacity=min(self.max_capacity, 2 * self.cfg.capacity))

    def _counters(self, state):
        return tuple(int(x) for x in jax.device_get(
            (state.n_dropped, state.hi, jnp.sum(state.active))))

    def post_fuse(self, prev_state: SurfelState, redo_fn=None,
                  frames: int = 1) -> None:
        """Pool maintenance after a fuse (or a fused window): lossless
        overflow recovery + fragmentation control.

        :param prev_state: the state BEFORE the fuse (kept alive by the
            caller — functional updates make this free)
        :param redo_fn: ``redo_fn(prev_state, cfg) -> new state`` re-runs
            the pure fuse step(s) after the pre-fuse state was compacted or
            promoted to a bigger bucket; used only when overflow occurred
        :param frames: number of fuse steps since the previous post_fuse
            (windowed streaming fuses a whole scan per call)
        """
        import warnings

        # fast path: ``hi`` grows by at most one frame of appends per fuse,
        # so while the upper bound leaves a quarter-frame of headroom below
        # the bucket capacity, neither drops nor promotion are possible —
        # skip the blocking device->host counter fetch entirely
        self._hi_upper += frames * self._n
        if self._hi_upper + self._n // 4 <= self.cfg.capacity:
            return

        n_dropped, hi, n_active = self._counters(self.state)
        new_drops = n_dropped - int(prev_state.n_dropped)
        while new_drops > 0 and redo_fn is not None:
            # lossless overflow: reclaim space (compact if fragmented,
            # else grow the bucket) and re-run from the pre-fuse state
            _, hi_p, act_p = self._counters(prev_state)
            if hi_p - act_p > self._n // 4:
                prev_state = self._compact(prev_state, self.cfg)
            elif self.cfg.capacity < self.max_capacity:
                self._grow()
                prev_state = surfel_pad(prev_state, self.cfg)
            else:
                break
            self.state = redo_fn(prev_state, self.cfg)
            n_dropped, hi, n_active = self._counters(self.state)
            new_drops = n_dropped - int(prev_state.n_dropped)
        if new_drops > 0 and not self._warned_overflow:
            warnings.warn(
                f"surfel map overflow: {n_dropped} appends dropped at the "
                f"capacity limit ({self.max_capacity}); raise "
                f"slam.map_capacity to avoid tracking-quality degradation")
            self._warned_overflow = True
        # proactive housekeeping BEFORE the next fuse could overflow: prefer
        # compaction (no recompile, frees pruned holes), then bucket growth
        if hi + self._n // 4 > self.cfg.capacity:
            if hi - n_active > self._n // 4:
                self.state = self._compact(self.state, self.cfg)
                hi = n_active  # compaction packs the live prefix
            elif self.cfg.capacity < self.max_capacity:
                self._grow()
                self.state = surfel_pad(self.state, self.cfg)
        self._hi_upper = hi  # re-anchor the host-side bound to ground truth

    def fuse(self, frame: Frame, pose) -> None:
        pose = jnp.asarray(pose, jnp.float32).reshape(7)
        prev = self.state
        self.state = self._fuse(prev, frame, pose, self.kmat, self.cfg)
        self.post_fuse(
            prev,
            lambda st, cfg: self._fuse(st, frame, pose, self.kmat, cfg))

    def render(self, kmat=None, extrinsics=None) -> Frame:
        kmat = self.kmat if kmat is None else jnp.asarray(kmat, jnp.float32)
        ex = None if extrinsics is None else jnp.asarray(extrinsics).reshape(7)
        return self._render(self.state, kmat, self.cfg, ex)

    def transform_cpy(self, tr) -> "SurfelMap":
        """Transformed copy. The reference's copy is rebuilt WITHOUT pmat, so
        its extrinsics reset to identity (surfel_map.py:216-219 ->
        _constructor without ``pmat``); a subsequent ``render()`` therefore
        projects the transformed points directly — preserved here."""
        import copy
        new = copy.copy(self)
        new.state = self._transform(self.state, jnp.asarray(tr).reshape(7))
        new.state = new.state._replace(pmat=se3.identity(()))
        return new

    @property
    def n_active(self) -> int:
        return int(jnp.sum(self.state.active))

    def save_ply(self, path: str, stable: bool = True) -> None:
        import numpy as np

        from robust_pose_tpu.utils.ply import save_ply as _save
        sel = stable_points(self.state) if stable else self.state.active
        sel = np.asarray(sel)
        opts = np.asarray(self.state.opts)[sel] / self.depth_scale
        rgb = np.asarray(self.state.rgb)[sel]
        if len(opts) > 0:
            _save(opts, rgb, path)
