"""Stage 4b: feature placement — which features spawn where, batched over chunks.

TPU-native equivalent of the reference's CPU placement pass (reference behavior:
/root/reference/src/terrain/chunk.cu:997-1197 ``generateColumnFeaturePlacements`` /
``isFeaturePos`` / ``tryGenerateCaveFeaturePlacement`` + the 49-offset gather).  The
reference runs this on the CPU purely because of dynamic counts (README.md:178); here
it is a masked fixed-capacity device pass: placements land in dense per-column grids,
then compact into capped per-chunk lists with the reference's ordering.

The per-column minstd draw sequence is replicated exactly: the engine state advances
only for columns whose control flow would draw in the reference (masked lcg steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..world import biomes as bio
from ..world import features_data as fd
from .fill import random_biome

F32 = jnp.float32
I32 = jnp.int32

SEED_COLUMN = 329828101  # chunk.cu:1053
SEED_SURFACE_POS = 518721  # chunk.cu:1134
SEED_CAVE_BOTTOM_F = 98239  # chunk.cu:1069
SEED_CAVE_BOTTOM_L = 191702
SEED_CAVE_TOP_F = 58321  # chunk.cu:1080
SEED_CAVE_TOP_L = 871503

MAX_LAYERS = bio.MAX_CAVE_LAYERS_PER_COLUMN

#: per-chunk compacted capacity.  The reference's per-chunk placement vectors
#: are UNBOUNDED (std::vector, chunk.cu:1030,1137); truncation happens only at
#: the per-consumer gather caps 2048/4096 (biome.hpp:7-8, chunk.cu:1573-1596).
#: Measured real-world per-chunk counts: surface ≤ 256 (one per column — exact
#: bound), cave ~400 typical (up to 2/layer/column).  The old 64/128 caps
#: silently dropped placements the reference keeps; these bounds make the
#: per-chunk lists lossless in practice (a count > cap would be visible as a
#: golden block-grid mismatch).
CHUNK_FEATURE_CAP = 256
CHUNK_CAVE_FEATURE_CAP = 1024


def is_feature_pos(wx, wz, cell, padding, seed):
    """isFeaturePos (chunk.cu:999-1008): jittered-uniform-grid membership test.

    wx/wz int arrays (world block coords), cell/padding int arrays, seed int array.
    """
    cellf = cell.astype(F32)
    gx = jnp.floor(wx.astype(F32) / cellf) * cellf
    gz = jnp.floor(wz.astype(F32) / cellf) * cellf
    rx, rz = hashes.rand2_from3(gx, gz, seed.astype(F32))
    internal = (cell - 2 * padding).astype(F32)
    px = gx.astype(I32) + padding + jnp.floor(rx * internal).astype(I32)
    pz = gz.astype(I32) + padding + jnp.floor(rz * internal).astype(I32)
    return (wx == px) & (wz == pz)


def _masked_u01(state, mask):
    """Advance the LCG and draw ONLY where mask (reference control-flow parity)."""
    nxt = hashes.lcg_next(state)
    v = (nxt - jnp.uint32(1)).astype(F32) / F32(2147483645.0)
    return v, jnp.where(mask, nxt, state)


def _sel(col, idx, dtype=None):
    """``col[idx]`` as a compare/select chain over a tiny trace-time numpy column.

    The gen tables are [5 or 24 biomes, <=4 gens] constants; gathering
    ``table[biome, g]`` at [B,16,16] lanes costs ~45 us of VPU gather latency
    PER LOOKUP, and generate_placements makes hundreds of them across its
    32-layer x 2 x 3-gen and 4-gen loops (measured: the stage ran 77 ms on a
    5x5 area, ~70% of the whole feature half).  A chain of ``where(idx == b,
    col[b], ...)`` over the column's distinct values is pure elementwise VPU
    work that XLA fuses into the surrounding iteration for free."""
    col = np.asarray(col)
    first = col[0].item()
    out = jnp.full(idx.shape, first, dtype or jnp.dtype(col.dtype))
    for b in range(1, col.shape[0]):
        v = col[b].item()
        if v != first:
            out = jnp.where(idx == I32(b), v, out)
    return out


@jax.jit
def generate_placements(heightfield, biome_weights, layers, cave_starts, cave_ends,
                        cave_bottom_biome, cave_top_biome, chunk_pos):
    """Batched placement pass.

    Args mirror the other stages ([B, ...]); cave biomes are int32 [B, 16, 16, 32].

    Returns dict of dense per-column placement grids:
      surface_feature [B,16,16] i32 (0 = none), surface_y i32, surface_replace bool,
      cave_feature [B,16,16,32,2] i32 (slot 2: 0=bottom,1=top), cave_y, cave_height,
      cave_replace.
    """
    B = heightfield.shape[0]
    lx = jnp.arange(16, dtype=I32)
    wx = jnp.broadcast_to(chunk_pos[:, 0, None, None] + lx[None, None, :], (B, 16, 16))
    wz = jnp.broadcast_to(chunk_pos[:, 1, None, None] + lx[None, :, None], (B, 16, 16))
    ground = heightfield.astype(I32)  # (int)height (chunk.cu:1048)

    state = hashes.seed_3(wx, wz, SEED_COLUMN)

    # tables stay NUMPY: every per-(biome, g) lookup below is a _sel chain over
    # the trace-time column, not a device gather (see _sel)
    cft = fd.CAVE_FEATURE_GEN_TABLE
    cave_count = np.asarray(cft["count"])
    cave_feature_t = np.asarray(cft["feature"])
    cave_cell_t = np.asarray(cft["cell"])
    cave_pad_t = np.asarray(cft["padding"])
    cave_chance_t = np.asarray(cft["chance"])
    cave_minh_t = np.asarray(cft["min_height"])
    cave_rep_t = np.asarray(cft["can_replace"])
    cave_ceil_t = np.asarray(cft["from_ceiling"])
    cave_lava_t = np.asarray(cft["in_lava"])
    n_cave_gens = cft["max_gens"]

    shape = (B, 16, 16)
    broken = jnp.zeros(shape, bool)
    surface_is_cave = jnp.zeros(shape, bool)

    out_cave_feature = jnp.zeros((B, 16, 16, MAX_LAYERS, 2), I32)
    out_cave_replace = jnp.zeros((B, 16, 16, MAX_LAYERS, 2), bool)

    for li in range(MAX_LAYERS):
        start = cave_starts[..., li].astype(I32)
        end = cave_ends[..., li].astype(I32)
        layer_h = end - start
        stop_here = (start == I32(384)) | (ground <= start)
        active = ~broken & ~stop_here

        for top in (False, True):
            # top features only when the layer has a ceiling (chunk.cu:1076)
            layer_ok = active if not top else active & (end != I32(384))
            biome = (cave_top_biome if top else cave_bottom_biome)[..., li]
            f_seed = SEED_CAVE_TOP_F if top else SEED_CAVE_BOTTOM_F
            l_seed = SEED_CAVE_TOP_L if top else SEED_CAVE_BOTTOM_L
            placed = jnp.zeros(shape, bool)
            for g in range(n_cave_gens):
                in_loop = layer_ok & ~placed & (I32(g) < _sel(cave_count, biome))
                r, state = _masked_u01(state, in_loop)
                feat = _sel(cave_feature_t[:, g], biome)
                gen_ceiling = _sel(cave_ceil_t[:, g], biome)
                lava_ok = _sel(cave_lava_t[:, g], biome) | (
                    jnp.where(top, end, start + I32(1)) > I32(bio.LAVA_LEVEL)
                )
                ok = (
                    in_loop
                    & (r < _sel(cave_chance_t[:, g], biome))
                    & (gen_ceiling == top)
                    & lava_ok
                    & (layer_h >= _sel(cave_minh_t[:, g], biome))
                )
                pos_seed = feat * f_seed + li * l_seed
                ok = ok & is_feature_pos(
                    wx, wz, _sel(cave_cell_t[:, g], biome), _sel(cave_pad_t[:, g], biome), pos_seed
                )
                slot = 1 if top else 0
                out_cave_feature = out_cave_feature.at[..., li, slot].set(
                    jnp.where(ok, feat, out_cave_feature[..., li, slot])
                )
                out_cave_replace = out_cave_replace.at[..., li, slot].set(
                    jnp.where(ok, _sel(cave_rep_t[:, g], biome), out_cave_replace[..., li, slot])
                )
                placed = placed | ok

        surface_here = active & (ground > start) & (ground <= end)
        surface_is_cave = surface_is_cave | surface_here
        broken = broken | stop_here | surface_here

    # ---- surface features (chunk.cu:1095-1144) ----
    sft = fd.FEATURE_GEN_TABLE
    s_count = np.asarray(sft["count"])
    s_feature = np.asarray(sft["feature"])
    s_cell = np.asarray(sft["cell"])
    s_pad = np.asarray(sft["padding"])
    s_chance = np.asarray(sft["chance"])
    s_rep = np.asarray(sft["can_replace"])
    s_ntl = np.asarray(sft["n_top_layers"])
    s_tl_mat = np.asarray(sft["top_layer_mat"])
    s_tl_min = np.asarray(sft["top_layer_min"])
    n_gens = sft["max_gens"]
    max_tl = s_tl_mat.shape[-1]

    do_surface = ~surface_is_cave
    r_biome, state = _masked_u01(state, do_surface)
    w_last = jnp.moveaxis(biome_weights, 1, -1)
    biome = random_biome(w_last, r_biome)  # [B,16,16]

    layer_starts = jnp.moveaxis(layers, 1, -1)  # [B,16,16,20]
    height = heightfield

    surface_feature = jnp.zeros(shape, I32)
    surface_replace = jnp.zeros(shape, bool)
    placed = jnp.zeros(shape, bool)
    for g in range(n_gens):
        in_loop = do_surface & ~placed & (I32(g) < _sel(s_count, biome))
        r, state = _masked_u01(state, in_loop)
        chance_ok = r < _sel(s_chance[:, g], biome)
        # possibleTopLayers constraint (chunk.cu:1110-1132)
        ntl = _sel(s_ntl[:, g], biome)
        can_place = ntl == 0
        for t in range(max_tl):
            mat = _sel(s_tl_mat[:, g, t], biome)
            # layer start/end lookup as a select over the column's DISTINCT
            # material ids (static slices of the layers axis) — the previous
            # per-column take_along_axis was two more ~45 us gathers per (g, t)
            mat_vals = np.unique(s_tl_mat[:, g, t])
            l_start = jnp.zeros_like(height)
            l_end = jnp.zeros_like(height)
            for m in mat_vals:
                m = int(m)
                pick = mat == I32(m)
                l_start = jnp.where(pick, layer_starts[..., m], l_start)
                l_end = jnp.where(
                    pick, layer_starts[..., min(m + 1, layer_starts.shape[-1] - 1)], l_end
                )
            tl_ok = (
                (l_start <= height)
                & (l_end >= height)
                & (jnp.minimum(l_end, height) - l_start >= _sel(s_tl_min[:, g, t], biome))
            )
            can_place = can_place | ((I32(t) < ntl) & tl_ok)
        feat = _sel(s_feature[:, g], biome)
        ok = (
            in_loop
            & chance_ok
            & can_place
            & is_feature_pos(
                wx, wz, _sel(s_cell[:, g], biome), _sel(s_pad[:, g], biome),
                feat * SEED_SURFACE_POS,
            )
        )
        surface_feature = jnp.where(ok, feat, surface_feature)
        surface_replace = jnp.where(ok, _sel(s_rep[:, g], biome), surface_replace)
        placed = placed | ok

    return {
        "surface_feature": surface_feature,
        "surface_y": ground + I32(1),
        "surface_replace": surface_replace,
        "cave_feature": out_cave_feature,
        "cave_y": cave_starts.astype(I32) + I32(1),
        "cave_height": (cave_ends - cave_starts).astype(I32),
        "cave_replace": out_cave_replace,
    }


def compact_placements(pl, chunk_pos):
    """Dense per-column grids -> capped per-chunk lists in the reference's order
    (columns scanned z-major, cave layers bottom→top with bottom-before-top slots).

    Returns dict of [B, CAP, ...] arrays with a 'feature' column of 0 past the end.
    """
    B = pl["surface_feature"].shape[0]
    lx = jnp.arange(16, dtype=I32)
    wx = chunk_pos[:, 0, None, None] + lx[None, None, :]
    wz = chunk_pos[:, 1, None, None] + lx[None, :, None]

    def compact(valid, order_key, cap, fields):
        """valid [B, N] bool over flattened candidates; fields dict of [B, N].
        The output's "count" is the TRUE (pre-cap) per-chunk placement count —
        the per-consumer gather-cap emulation (features.apply_placements_area)
        needs exact prefix sums over the reference's unbounded lists."""
        key = jnp.where(valid, order_key, I32(2**30))
        idx = jnp.argsort(key, axis=-1)[:, :cap]
        out = {k: jnp.take_along_axis(v, idx, axis=-1) for k, v in fields.items()}
        taken_valid = jnp.take_along_axis(valid, idx, axis=-1)
        out["feature"] = jnp.where(taken_valid, out["feature"], I32(0))
        out["count"] = valid.sum(axis=-1).astype(I32)
        return out

    # surface: candidates = 256 columns
    sf = pl["surface_feature"].reshape(B, 256)
    s_fields = {
        "feature": sf,
        "x": jnp.broadcast_to(wx, (B, 16, 16)).reshape(B, 256),
        "y": pl["surface_y"].reshape(B, 256),
        "z": jnp.broadcast_to(wz, (B, 16, 16)).reshape(B, 256),
        "replace": pl["surface_replace"].reshape(B, 256).astype(I32),
    }
    order = jnp.broadcast_to(jnp.arange(256, dtype=I32), (B, 256))
    surface = compact(sf > 0, order, CHUNK_FEATURE_CAP, s_fields)

    # cave: candidates = 256 cols × 32 layers × 2 slots
    cf = pl["cave_feature"].reshape(B, 256 * MAX_LAYERS * 2)
    cy = jnp.broadcast_to(pl["cave_y"][..., None], pl["cave_feature"].shape).reshape(B, -1)
    ch = jnp.broadcast_to(pl["cave_height"][..., None], pl["cave_feature"].shape).reshape(B, -1)
    cx = jnp.broadcast_to(wx[..., None, None], pl["cave_feature"].shape).reshape(B, -1)
    cz = jnp.broadcast_to(wz[..., None, None], pl["cave_feature"].shape).reshape(B, -1)
    c_fields = {
        "feature": cf,
        "x": cx,
        "y": cy,
        "z": cz,
        "height": ch,
        "replace": pl["cave_replace"].reshape(B, -1).astype(I32),
    }
    order = jnp.broadcast_to(
        jnp.arange(256 * MAX_LAYERS * 2, dtype=I32), (B, 256 * MAX_LAYERS * 2)
    )
    cave = compact(cf > 0, order, CHUNK_CAVE_FEATURE_CAP, c_fields)
    return {"surface": surface, "cave": cave}


# 49-chunk gather offsets, reference order (chunk.cu:1158-1167)
GATHER_OFFSETS = np.array(
    [
        (0, 0), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1),
        (-1, 0), (-1, 1), (2, 0), (2, 1), (2, 2), (1, 2), (0, 2),
        (-1, 2), (-2, 2), (-2, 1), (-2, 0), (-2, -1), (-2, -2),
        (-1, -2), (0, -2), (1, -2), (2, -2), (2, -1),
        (-3, -3), (-2, -3), (-1, -3), (0, -3), (1, -3), (2, -3), (3, -3),
        (3, -2), (3, -1), (3, 0), (3, 1), (3, 2), (3, 3),
        (2, 3), (1, 3), (0, 3), (-1, 3), (-2, 3), (-3, 3),
        (-3, 2), (-3, 1), (-3, 0), (-3, -1), (-3, -2),
    ],
    np.int32,
)

GATHERED_FEATURE_CAP = 49 * CHUNK_FEATURE_CAP  # compacted below to the reference caps
MAX_GATHERED_FEATURES = bio.MAX_GATHERED_FEATURES_PER_CHUNK
MAX_GATHERED_CAVE_FEATURES = bio.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK


def gather_from_neighborhood(per_chunk_lists, cap: int):
    """Concatenate 49 per-chunk lists ([49, CAP, ...] dict) in offset order and
    re-compact to `cap` entries (the reference's MAX_GATHERED_* truncation,
    chunk.cu:1573-1596, reproduced exactly: valid-first stable order = full-list
    concatenation order). Returns dict of [cap] arrays."""
    per_chunk_lists = {k: v for k, v in per_chunk_lists.items() if k != "count"}
    n, c = per_chunk_lists["feature"].shape[:2]
    flat = {k: v.reshape(n * c, *v.shape[2:]) for k, v in per_chunk_lists.items()}
    valid = flat["feature"] > 0
    key = jnp.where(valid, jnp.arange(n * c, dtype=I32), I32(2**30))
    idx = jnp.argsort(key)[:cap]
    out = {k: v[idx] for k, v in flat.items()}
    out["feature"] = jnp.where(valid[idx], out["feature"], I32(0))
    return out


def gather_from_neighborhood_batch(per_chunk_lists, cap: int):
    """Batched 49-chunk gather: dict of [B, 49, K] arrays -> dict of [B, cap]."""
    import jax

    return jax.vmap(lambda d: gather_from_neighborhood(d, cap))(per_chunk_lists)
