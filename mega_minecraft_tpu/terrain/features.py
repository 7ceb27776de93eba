"""Stage 5b: apply gathered feature placements to a chunk's block volume.

TPU-native equivalent of the reference's in-kernel feature loops (reference behavior:
/root/reference/src/terrain/chunk.cu:1438-1510 — per block, iterate ≤2048 gathered
surface + ≤4096 cave placements with global and per-feature height-bound early exits;
first successful feature wins; surface placements take priority over cave ones).

Design: the loop inverts to per-placement — a ``lax.while_loop`` over the compacted
placement list whose body evaluates ONE placement's geometry over the whole 16×16×384
volume (``lax.switch`` picks the feature type, so only that branch executes).  Blocks
already claimed by an earlier placement are masked out, reproducing first-hit-wins
order.  The per-placement 64-draw RNG stream is generated from the placement position
inside the body (the reference reseeds per evaluation, so streams are
block-independent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..world import features_data as fd
from ..world.blocks import Block
from . import features_sdf as sdf

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8

AIR = U8(int(Block.AIR))


#: XZ half-extent of each SURFACE feature's geometry (blocks), measured by
#: tools/sdf_extents.py + margin — sizes the application window in
#: apply_placements_area.  A too-small radius CLIPS the feature (drops blocks);
#: tests/test_features.py::TestWindows pins table >= probe.
SURFACE_XZ_RADIUS = {
    int(fd.Feature.SPHERE): 7,  # probe 5
    int(fd.Feature.CORAL): 9,  # probe 6
    int(fd.Feature.KELP): 3,  # probe 0 (vertical strand)
    int(fd.Feature.ICEBERG): 39,  # probe 33-36 over 144 seeds
    int(fd.Feature.ACACIA_TREE): 10,  # probe 7
    int(fd.Feature.REDWOOD_TREE): 14,  # probe 11
    int(fd.Feature.CYPRESS_TREE): 12,  # probe 9
    int(fd.Feature.BIRCH_TREE): 6,  # probe 3
    int(fd.Feature.PINE_TREE): 5,  # probe 2
    int(fd.Feature.PINE_SHRUB): 4,  # probe 2
    int(fd.Feature.RAFFLESIA): 9,  # probe 7
    int(fd.Feature.LARGE_JUNGLE_TREE): 11,  # probe 8
    int(fd.Feature.SMALL_JUNGLE_TREE): 7,  # probe 4
    int(fd.Feature.TINY_JUNGLE_TREE): 3,  # probe 1
    int(fd.Feature.MEDIUM_PURPLE_MUSHROOM): 4,  # probe 2
    int(fd.Feature.PURPLE_MUSHROOM): 47,  # probe 41 over 144 seeds
    int(fd.Feature.MEDIUM_CRYSTAL): 13,  # probe 10
    int(fd.Feature.CRYSTAL): 25,  # probe 21
    int(fd.Feature.PALM_TREE): 16,  # probe 13
    int(fd.Feature.CACTUS): 4,  # probe 2
}

#: (xz_radius, y_anchor) for CAVE features: "floor" = near the layer bottom
#: (placement y), "ceil" = near the layer top (y + layer_height), "full" =
#: spans the layer (whole-column window).
CAVE_WINDOWS = {
    int(fd.CaveFeature.TEST_GLOWSTONE_PILLAR): (3, "full"),  # probe 0
    int(fd.CaveFeature.TEST_SHROOMLIGHT_PILLAR): (3, "full"),  # probe 0
    int(fd.CaveFeature.CAVE_VINE): (3, "full"),  # probe 0 (vertical strand)
    int(fd.CaveFeature.GLOWSTONE_CLUSTER): (8, "ceil"),  # probe 5
    int(fd.CaveFeature.STORMLIGHT_SPHERE): (10, "floor"),  # probe 7
    int(fd.CaveFeature.CEILING_STORMLIGHT_SPHERE): (10, "ceil"),  # probe 7
    int(fd.CaveFeature.CRYSTAL_PILLAR): (7, "full"),  # probe 4
    int(fd.CaveFeature.WARPED_FUNGUS): (6, "floor"),  # probe 3
    int(fd.CaveFeature.AMBER_FUNGUS): (5, "floor"),  # probe 2
}


def _dispatch_tables(registry: dict, n_types: int):
    """Build a lax.switch branch list over feature type ids."""

    def none_fn(s, fx, fy, fz, wx, wy, wz, brng, extra):
        z = jnp.zeros(jnp.shape(fx), bool)
        return z, jnp.zeros(jnp.shape(fx), U8), brng

    return [registry.get(i, none_fn) for i in range(n_types)]


@partial(jax.jit, static_argnames=("cave",))
def apply_placements(blocks, placements, chunk_pos1, heightfield, cave: bool):
    """Apply one compacted placement list to one chunk.

    Args:
      blocks: [16, 16, 384] u8.
      placements: dict of [K] arrays (feature, x, y, z, replace [, height]).
      chunk_pos1: [2] i32 world-block origin of this chunk.
      heightfield: [16, 16] f32 (unused by tests today; reserved).
      cave: static — selects the cave feature registry + RNG seeds.

    Returns (blocks, placed_mask) with features written in list order.
    """
    lx = jnp.arange(16, dtype=I32)
    wx = jnp.broadcast_to(chunk_pos1[0] + lx[None, :, None], (16, 16, 384))
    wz = jnp.broadcast_to(chunk_pos1[1] + lx[:, None, None], (16, 16, 384))
    wy = jnp.broadcast_to(jnp.arange(384, dtype=I32), (16, 16, 384))

    if cave:
        registry = _dispatch_tables(sdf.CAVE_FEATURE_FNS, fd.NUM_CAVE_FEATURES)
        bounds = jnp.asarray(fd.CAVE_FEATURE_HEIGHT_BOUNDS)
        feat_seed = sdf.SEED_CAVE_FEATURE_RNG
        block_seed = sdf.SEED_CAVE_BLOCK_RNG
    else:
        registry = _dispatch_tables(sdf.SURFACE_FEATURE_FNS, fd.NUM_FEATURES)
        bounds = jnp.asarray(fd.FEATURE_HEIGHT_BOUNDS)
        feat_seed = sdf.SEED_SURFACE_FEATURE_RNG
        block_seed = sdf.SEED_SURFACE_BLOCK_RNG

    brng0 = hashes.seed_4(wx, wy, wz, block_seed)
    K = placements["feature"].shape[0]

    def body(state):
        i, blocks, placed = state
        feat = placements["feature"][i]
        px = placements["x"][i]
        py = placements["y"][i]
        pz = placements["z"][i]
        can_replace = placements["replace"][i] > 0
        if cave:
            layer_h = placements["height"][i]
            lo = py + bounds[feat, 0]
            hi = py + layer_h + bounds[feat, 1]
        else:
            layer_h = I32(0)
            lo = py + bounds[feat, 0]
            hi = py + bounds[feat, 1]

        stream = sdf.draw_stream(px, py, pz, feat_seed)
        fx = wx - px
        fy = wy - py
        fz = wz - pz
        extra = {
            "fy_pos": py,
            "fpos": (px, py, pz),
            "layer_height": layer_h,
        }

        def run(fn):
            return lambda: fn(stream, fx, fy, fz, wx, wy, wz, brng0, extra)

        hit, fblock, _ = jax.lax.switch(feat, [run(f) for f in registry])
        candidate = (
            ~placed
            & ((blocks == AIR) | can_replace)
            & (wy >= lo)
            & (wy <= hi)
            & hit
        )
        blocks = jnp.where(candidate, fblock, blocks)
        placed = placed | candidate
        return i + 1, blocks, placed

    def cond(state):
        i, _, _ = state
        return (i < K) & (placements["feature"][i] != 0)

    placed0 = jnp.zeros((16, 16, 384), bool)
    _, blocks, placed = jax.lax.while_loop(cond, body, (jnp.int32(0), blocks, placed0))
    return blocks, placed


@partial(jax.jit, static_argnames=("ncx", "ncz", "cave"))
def apply_placements_area(area_blocks, lists, origin_xz, ncx: int, ncz: int, cave: bool):
    """Apply every chunk's SOURCE placement list over the whole area volume at once.

    Equivalent to running ``apply_placements`` per chunk on its 49-gathered list
    (the fused-pipeline path), but each placement is evaluated ONCE over the
    [ncz*16, ncx*16, 384] area instead of ~once per consumer chunk it reaches.
    The reference resolves per-voxel conflicts by gathered-list order, and the
    gathered order is (spiral rank of source-relative-to-consumer, slot)
    (chunk.cu:1158-1167 offsets → GATHER_OFFSETS); that priority is reproduced
    exactly by a min-key combine with key = rank(src_chunk, voxel_chunk)·K + slot,
    where the rank maps are STATIC per (source, consumer) chunk-index pair.
    Sources >3 chunks from a voxel's chunk get rank ∞ there — the same clipping
    the 49-gather performs.

    The reference ALSO truncates each consumer's gathered list at
    MAX_GATHERED_*_PER_CHUNK = 2048/4096 (chunk.cu:1573-1596).  Real worlds
    stay far below those caps (~10 surface / ~30 cave placements per 49-gather),
    but the truncation is still emulated exactly: a placement is visible to a
    consumer chunk iff its gathered rank (per-consumer prefix count over the
    spiral order + within-chunk slot) is below the cap, using the TRUE
    per-chunk counts carried by ``lists["count"]``.

    Args:
      area_blocks: [ncz*16, ncx*16, 384] u8 (chunk rows z-major).
      lists: dict of [B, K] source placements, B = ncz*ncx row-major inner chunks.
      origin_xz: [2] i32 world-block origin (x, z) of the area corner.
    Returns (area_blocks_with_features, placed_mask).
    """
    from .feature_placement import GATHER_OFFSETS

    lists = dict(lists)
    # [B] TRUE per-chunk placement counts (synthetic test lists may omit it, in
    # which case the lists are lossless and valid-entry counts are exact)
    counts = lists.pop("count", None)
    if counts is None:
        counts = (lists["feature"] > 0).sum(axis=-1).astype(I32)
    B, K = lists["feature"].shape
    assert B == ncx * ncz
    nz, nx = ncz * 16, ncx * 16
    from ..world import biomes as bio

    gather_cap = (
        bio.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK if cave
        else bio.MAX_GATHERED_FEATURES_PER_CHUNK
    )

    if cave:
        bounds = jnp.asarray(fd.CAVE_FEATURE_HEIGHT_BOUNDS)
        feat_seed = sdf.SEED_CAVE_FEATURE_RNG
        block_seed = sdf.SEED_CAVE_BLOCK_RNG
    else:
        bounds = jnp.asarray(fd.FEATURE_HEIGHT_BOUNDS)
        feat_seed = sdf.SEED_SURFACE_FEATURE_RNG
        block_seed = sdf.SEED_SURFACE_BLOCK_RNG

    # static spiral-rank maps: rank_maps[src_b, vz, vx] = gathered position of
    # source chunk src_b in consumer chunk (vz, vx)'s spiral, or BIG if > 3 away
    BIG = np.int32(64)
    rank_of = {(int(o[0]), int(o[1])): r for r, o in enumerate(GATHER_OFFSETS)}
    rank_maps = np.full((B, ncz, ncx), BIG, np.int32)
    for sb in range(B):
        sz, sx = divmod(sb, ncx)
        for vz in range(ncz):
            for vx in range(ncx):
                r = rank_of.get((sx - vx, sz - vz))
                if r is not None:
                    rank_maps[sb, vz, vx] = r
    rank_maps = jnp.asarray(rank_maps)
    KEY_INF = jnp.iinfo(jnp.int32).max

    # per-consumer gathered-list prefix counts: prefix[cb, r] = number of
    # placements from spiral offsets BEFORE rank r in consumer cb's gather —
    # a placement at (source, slot k) sits at gathered index prefix[cb, rank]+k
    # and the reference drops it there when that index >= the 2048/4096 cap
    src_of = np.full((B, len(GATHER_OFFSETS)), -1, np.int64)
    for cb in range(B):
        vz, vx = divmod(cb, ncx)
        for r, (ox, oz) in enumerate(GATHER_OFFSETS):
            sx, sz = vx + int(ox), vz + int(oz)
            if 0 <= sx < ncx and 0 <= sz < ncz:
                src_of[cb, r] = sz * ncx + sx
    counts_mat = jnp.where(
        jnp.asarray(src_of >= 0), counts[jnp.asarray(np.maximum(src_of, 0))], I32(0)
    )  # [B, 49]
    prefix = jnp.cumsum(counts_mat, axis=1) - counts_mat  # exclusive prefix [B, 49]
    # pad rank BIG -> prefix irrelevant (key goes INF); clip for safe take
    prefix = jnp.concatenate(
        [prefix, jnp.zeros((B, int(BIG) + 1 - len(GATHER_OFFSETS)), I32)], axis=1
    )

    # flatten sources and push empty slots to the end (order-preserving), so the
    # while_loop visits only real placements
    flat = {k: v.reshape(B * K) for k, v in lists.items()}
    valid = flat["feature"] > 0
    sort_key = jnp.where(valid, jnp.arange(B * K, dtype=I32), I32(2**30))
    order = jnp.argsort(sort_key)
    flat = {k: v[order] for k, v in flat.items()}
    flat["feature"] = jnp.where(valid[order], flat["feature"], I32(0))
    src_b = (order // K).astype(I32)
    slot = (order % K).astype(I32)

    # Each placement is applied over a per-type WINDOW (dynamic_slice around the
    # placement), not the whole area: the windows dominate every SDF's measured
    # extent (tools/sdf_extents.py; pinned by tests/test_features.py) and shrink
    # the per-placement work 5-75x vs a full-area evaluation.  y windows derive
    # from the same height-bounds tables the candidate rule clips with, so they
    # can't drop blocks by construction; XZ radii come from the extent probe.
    if cave:
        win_tab = {f: CAVE_WINDOWS.get(f, (15, "full")) for f in range(fd.NUM_CAVE_FEATURES)}
    else:
        win_tab = {f: (SURFACE_XZ_RADIUS.get(f, 31), "floor") for f in range(fd.NUM_FEATURES)}
    bounds_np = fd.CAVE_FEATURE_HEIGHT_BOUNDS if cave else fd.FEATURE_HEIGHT_BOUNDS
    fns = sdf.CAVE_FEATURE_FNS if cave else sdf.SURFACE_FEATURE_FNS
    n_types = fd.NUM_CAVE_FEATURES if cave else fd.NUM_FEATURES

    # ------------------------------------------------------------------
    # Batched per-TYPE application (the round-3 serial while_loop over one
    # placement at a time left the VPU idle: ~40 surface + ~100 cave
    # placements × one small window each serialized into ~1.3 ms/iteration).
    # Per feature type: its placements are compacted to the front (order
    # preserved), then a while_loop consumes them P at a time — the P SDF
    # evaluations run as ONE vmapped program over [P, W, W, ylen] lanes, and
    # the combine is a short unrolled chain of window min-updates.  The
    # per-voxel winner rule (min spiral-rank key) is order-independent, so
    # processing placements grouped by type is exact.  key and block are
    # packed into ONE i32 (key·256 | block; keys < 49·K ≤ 50 176 so the pack
    # fits in 26 bits) — the min-combine then carries the winning block for
    # free and the loop state is a single [nz, nx, 384] i32.
    # ------------------------------------------------------------------
    NK = B * K
    feat_all = flat["feature"]
    INF = jnp.int32(0x7FFFFFFF)
    assert int(BIG) * K * 256 < 2**31  # key·256|block pack never reaches INF

    def window_geom(fid):
        r, ymode = win_tab[fid]
        W = min(nz, nx)
        for w in (16, 32, 48, 64, 80):
            if 2 * r + 2 <= w <= min(nz, nx):
                W = w
                break
        b_lo, b_hi = int(bounds_np[fid, 0]), int(bounds_np[fid, 1])
        if ymode == "full":
            y_len = 384
        elif ymode == "floor" and not cave:
            y_len = min(384, ((b_hi - b_lo + 4) + 15) // 16 * 16)
        else:
            y_len = min(384, 96)
        return W, y_len, ymode, b_lo, b_hi

    # ONE global type-grouped order (a per-type argsort would instantiate ~30
    # sort programs and blew the fused-pipeline compile past bench.py's 25-min
    # leg deadline): sort by (feature, original index); type fid's placements
    # then live at sel_all[type_start[fid] : type_start[fid] + type_cnt[fid]]
    # in original order.
    sel_all = jnp.argsort(
        jnp.where(valid_order := feat_all > 0,
                  feat_all * I32(NK) + jnp.arange(NK, dtype=I32),
                  jnp.iinfo(jnp.int32).max)
    ).astype(I32)
    sel_all = jnp.concatenate([sel_all, jnp.zeros((8,), I32)])
    type_cnt = jnp.zeros((n_types + 1,), I32).at[jnp.where(valid_order, feat_all, 0)].add(1)
    type_cnt = type_cnt.at[0].set(0)  # invalid entries sort to the END, not bin 0
    type_start = jnp.cumsum(type_cnt) - type_cnt  # exclusive prefix over types 1..

    def run_type(fid, fn, packed_best):
        W, y_len, ymode, b_lo, b_hi = window_geom(fid)
        # batch width: target ~1M-voxel vmapped programs, ≤8 combine unrolls
        P = int(np.clip((1 << 20) // (W * W * y_len), 1, 8))
        cnt = type_cnt[fid]
        start0 = type_start[fid]

        def eval_one(px, py, pz, layer_h, rep, sb, sl, valid):
            lo = py + bounds[fid, 0]
            hi = py + (layer_h if cave else I32(0)) + bounds[fid, 1]
            z0 = jnp.clip(pz - origin_xz[1] - I32(W // 2 - 1), 0, nz - W)
            x0 = jnp.clip(px - origin_xz[0] - I32(W // 2 - 1), 0, nx - W)
            if ymode == "full" or y_len == 384:
                y0 = I32(0)
            elif ymode == "ceil":
                y0 = jnp.clip(py + layer_h + I32(b_hi + 2 - y_len), 0, 384 - y_len)
            else:
                y0 = jnp.clip(py + I32(b_lo - 2), 0, 384 - y_len)
            az = jnp.arange(W, dtype=I32)
            ay = jnp.arange(y_len, dtype=I32)
            shape = (W, W, y_len)
            wzw = jnp.broadcast_to(origin_xz[1] + z0 + az[:, None, None], shape)
            wxw = jnp.broadcast_to(origin_xz[0] + x0 + az[None, :, None], shape)
            wyw = jnp.broadcast_to(y0 + ay[None, None, :], shape)
            brng_w = hashes.seed_4(wxw, wyw, wzw, block_seed)
            stream = sdf.draw_stream(px, py, pz, feat_seed)
            extra = {"fy_pos": py, "fpos": (px, py, pz),
                     "layer_height": layer_h if cave else I32(0)}
            hit, fblock, _ = fn(
                stream, wxw - px, wyw - py, wzw - pz, wxw, wyw, wzw, brng_w, extra
            )
            hit = jnp.broadcast_to(hit, shape) & (wyw >= lo) & (wyw <= hi) & valid
            fblock = jnp.broadcast_to(fblock, shape)
            # per-voxel priority: gathered position in the voxel's own chunk's
            # spiral (+ the reference's per-consumer gather-cap truncation,
            # chunk.cu:1573-1596)
            czc = (z0 + az) // 16
            cxc = (x0 + az) // 16
            rm = rank_maps[sb][czc[:, None], cxc[None, :]]  # [W, W]
            key = rm * I32(K) + sl
            key = jnp.where(rm >= I32(BIG), INF, key)
            cb = czc[:, None] * I32(ncx) + cxc[None, :]
            pr = prefix[cb, jnp.clip(rm, 0, I32(BIG))]
            key = jnp.where(pr + sl < I32(gather_cap), key, INF)
            pc = jnp.where(
                hit & (key[:, :, None] < INF),
                key[:, :, None] * I32(256) + fblock.astype(I32),
                INF,
            )
            return z0, x0, y0, pc, rep

        ev = jax.vmap(eval_one)

        def body(state):
            i, packed_best = state
            idxb = jax.lax.dynamic_slice(sel_all, (start0 + i,), (P,))
            valid = (i + jnp.arange(P, dtype=I32)) < cnt
            px = flat["x"][idxb]
            py = flat["y"][idxb]
            pz = flat["z"][idxb]
            rep = flat["replace"][idxb] > 0
            lh = flat["height"][idxb] if cave else jnp.zeros((P,), I32)
            z0, x0, y0, pc, repv = ev(px, py, pz, lh, rep, src_b[idxb], slot[idxb], valid)
            for j in range(P):
                start = (z0[j], x0[j], y0[j])
                shape = pc.shape[1:]
                blocks_w = jax.lax.dynamic_slice(area_blocks, start, shape)
                ok = (blocks_w == AIR) | repv[j]
                win = jax.lax.dynamic_slice(packed_best, start, shape)
                win = jnp.minimum(win, jnp.where(ok, pc[j], INF))
                packed_best = jax.lax.dynamic_update_slice(packed_best, win, start)
            return i + I32(P), packed_best

        _, packed_best = jax.lax.while_loop(
            lambda s: s[0] < cnt, body, (jnp.int32(0), packed_best)
        )
        return packed_best

    packed_best = jnp.full((nz, nx, 384), INF, jnp.int32)
    for fid in range(n_types):
        fn = fns.get(fid)
        if fn is None:
            continue
        packed_best = run_type(fid, fn, packed_best)

    placed = packed_best != INF
    return (
        jnp.where(placed, (packed_best & I32(0xFF)).astype(U8), area_blocks),
        placed,
    )


@partial(jax.jit, static_argnames=("ncx", "ncz"))
def apply_features_area(blocks, surface_lists, cave_lists, chunk_pos, ncx: int, ncz: int):
    """Area-level ``apply_features_chunk``: surface placements take priority; cave
    placements test against the TERRAIN block and only claim voxels no surface
    feature took (chunk.cu:1443-1507).

    Args:
      blocks: [B, 16, 16, 384] u8, B = ncz*ncx row-major.
      surface_lists / cave_lists: per-chunk SOURCE lists (dict of [B, K]) —
        the pre-gather output of feature_placement.compact_placements.
      chunk_pos: [B, 2] world-block chunk origins.
    Returns [B, 16, 16, 384] u8.
    """
    B = blocks.shape[0]
    area = (
        blocks.reshape(ncz, ncx, 16, 16, 384)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ncz * 16, ncx * 16, 384)
    )
    origin = chunk_pos[0]
    area_s, placed_s = apply_placements_area(area, surface_lists, origin, ncx, ncz, cave=False)
    area_c, placed_c = apply_placements_area(area, cave_lists, origin, ncx, ncz, cave=True)
    out = jnp.where(placed_s, area_s, jnp.where(placed_c, area_c, area))
    return (
        out.reshape(ncz, 16, ncx, 16, 384)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, 16, 16, 384)
    )


@jax.jit
def apply_features_chunk(blocks, surface_list, cave_list, chunk_pos1, heightfield):
    """Surface placements take priority; cave placements test against the TERRAIN
    block (not surface-feature blocks) and only claim blocks no surface feature took
    (chunk.cu:1443-1507)."""
    blocks_s, placed_s = apply_placements(blocks, surface_list, chunk_pos1, heightfield, cave=False)
    blocks_c, placed_c = apply_placements(blocks, cave_list, chunk_pos1, heightfield, cave=True)
    return jnp.where(placed_s, blocks_s, jnp.where(placed_c, blocks_c, blocks))


@jax.jit
def apply_features_batch(blocks, surface_lists, cave_lists, chunk_pos, heightfield):
    """Batched ``apply_features_chunk`` over a leading chunk axis via ``lax.map``:
    the per-chunk placement while_loops run back-to-back on device in ONE dispatch
    (``vmap`` would instead evaluate every ``lax.switch`` branch for every placement).

    Args are the per-chunk shapes with a leading [B] axis (list dicts: [B, K])."""

    def one(args):
        b, s, c, p, h = args
        return apply_features_chunk(b, s, c, p, h)

    return jax.lax.map(one, (blocks, surface_lists, cave_lists, chunk_pos, heightfield))
