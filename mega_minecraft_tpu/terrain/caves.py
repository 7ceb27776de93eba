"""Stage 4: caves + cave biomes, batched over chunks.

TPU-native equivalent of the reference's caves kernel (reference behavior:
/root/reference/src/terrain/chunk.cu:753-993 ``kernGenerateCaves`` /
``shouldGenerateCaveAtBlock`` and biomeFuncs.hpp:130-220 cave biome noise/weights):
per block, a cave test combining modified 3-min Worley noise, huge-cave fBm
modulation, height-ratio falloffs and 2D-Worley ravines; per column, air runs are
compressed into ≤32 ``CaveLayer`` records with bottom/top cave biomes.

Design: the reference's warp-shuffle flip compaction becomes a single vectorized
sort along y — flip positions (ascending y == flip order) sort to the front, so
``sorted[2k] / sorted[2k+1]`` are layer k's (start, end).  Cave biome sampling is the
same seeded minstd draw as the reference, evaluated as masked vector math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import hashes
from ..ops.noise import (
    fbm2,
    fbm2_from2,
    fbm3,
    fbm3_from3,
    simplex3,
    smoothstep,
    special_cave_noise,
    worley2,
)
from ..world import biomes as bio

F32 = jnp.float32
I32 = jnp.int32

Y_SIZE = 384
MAX_LAYERS = bio.MAX_CAVE_LAYERS_PER_COLUMN  # 32
SEED_BOTTOM_BIOME = 329271348  # chunk.cu:920
SEED_TOP_BIOME = 4982921  # chunk.cu:933
SEED_FILL_BIOME = 190249401  # chunk.cu:1243


#: ``carved`` caves cannot exist at or above this y: worleyEdgeThreshold carries a
#: factor smoothstep(142, 95, y + oceanOffset) with oceanOffset >= 0, which is 0 for
#: y >= 142, failing the `threshold > 0.04` gate (chunk.cu:769-781).  Bounding the
#: 3-D carve-noise evaluation to this band cuts the stage's noise volume 384/144x.
CARVE_Y_MAX = 144


def _carved(wxf, wyf, wzf, ocean_beach_weight):
    """The 3-D 'carved' term of shouldGenerateCaveAtBlock (chunk.cu:767-783)."""
    nx = wxf * F32(0.0050)
    ny = wyf * F32(0.0050)
    nz = wzf * F32(0.0050)
    top_ratio_y_offset = ocean_beach_weight * F32(50.0)
    top_ratio = smoothstep(F32(142.0), F32(95.0), wyf + top_ratio_y_offset)
    bottom_ratio = smoothstep(F32(5.0), F32(20.0), wyf)

    ox, oy, oz = fbm3_from3(nx * F32(0.8), ny * F32(0.8), nz * F32(0.8), octaves=5)
    cave_noise = special_cave_noise(
        nx + ox * F32(1.8), ny * F32(1.6) + oy * F32(1.8), nz + oz * F32(1.8)
    )

    worley_edge_thr = F32(0.24) + F32(0.12) * fbm3(nx * F32(4.0), ny * F32(4.0), nz * F32(4.0), octaves=4)
    huge = smoothstep(F32(0.2), F32(0.4), fbm3(nx * F32(0.07), ny * F32(0.07), nz * F32(0.07), octaves=4))
    worley_edge_thr = worley_edge_thr * (F32(1.0) + F32(1.4) * huge)
    worley_edge_thr = worley_edge_thr * top_ratio * (F32(0.3) + F32(0.7) * bottom_ratio)

    return jnp.logical_and(worley_edge_thr > F32(0.04), cave_noise < worley_edge_thr)


def _ravine_min_y(wxf, wzf, ocean_beach_weight):
    """The per-COLUMN ravine term (chunk.cu:785-808): every noise input is 2-D, so
    the block test reduces to ``wy > min_y`` against a per-column threshold
    (+inf where no ravine)."""
    rx = wxf * F32(0.0015)
    rz = wzf * F32(0.0015)
    wofx, wofz = fbm2_from2(rx * F32(10.0), rz * F32(10.0), octaves=4)
    rav = worley2(rx + F32(0.03) * wofx, rz + F32(0.03) * wofz, want_color=True)
    rav_worley = rav["f1"]
    rav_color_r = rav["color"][0]
    rav_thr = F32(0.12) * (F32(1.0) - ocean_beach_weight)
    in_rav_cell = rav_worley < rav_thr

    rav_top = F32(120.0) + F32(24.0) * rav_color_r
    rav_ratio = F32(1.0) - rav_worley / rav_thr
    rav_depth = F32(60.0) + F32(26.0) * fbm2(
        rx * F32(8.0) + F32(8391.32), rz * F32(8.0) + F32(4821.39), octaves=4
    )
    rav_depth = rav_depth * smoothstep(F32(0.0), F32(0.3), rav_ratio)
    wave_off = F32(4.0) * fbm2(rx * F32(3.0) + F32(5129.32), rz * F32(3.0) + F32(1392.49), octaves=4)
    wave = jnp.sin((rx + rz) * F32(15.0) + wave_off)
    wave = smoothstep(F32(0.4), F32(0.6), wave)
    rav_depth = rav_depth * wave

    ok = jnp.logical_and(in_rav_cell, rav_depth > F32(0.0001))
    return jnp.where(ok, rav_top - rav_depth, F32(1e9))


def should_generate_cave(wx, wy, wz, max_height, ocean_beach_weight):
    """Vectorized shouldGenerateCaveAtBlock (chunk.cu:755-810).

    All args broadcastable; wy is int-valued. Returns bool array.
    """
    wxf = jnp.asarray(wx, F32)
    wyf = jnp.asarray(wy, F32)
    wzf = jnp.asarray(wz, F32)

    above_surface = wyf > jnp.maximum(jnp.floor(max_height), F32(bio.SEA_LEVEL))

    carved = _carved(wxf, wyf, wzf, ocean_beach_weight)

    ravine = wyf > _ravine_min_y(wxf, wzf, ocean_beach_weight)

    cave = jnp.logical_or(above_surface, jnp.logical_or(carved, ravine))
    return jnp.logical_and(jnp.asarray(wy) != 0, cave)


def cave_biome_weights_from_noise(noise4):
    """[..., 4] channels (none, shallow, warped, rocky) -> [..., NUM_CAVE_BIOMES]."""
    table = jnp.asarray(bio.CAVE_BIOME_NOISE_WEIGHTS)  # [5, 4]
    n = noise4[..., None, :]
    factor = jnp.where(table == 1, n, jnp.where(table == 2, F32(1.0) - n, F32(1.0)))
    return jnp.prod(factor, axis=-1)


def cave_biome_noise(wx, wy, wz, max_height):
    """getCaveBiomeNoise (biomeFuncs.hpp:135-156) -> [..., 4] channels."""
    wxf = jnp.asarray(wx, F32)
    wyf = jnp.asarray(wy, F32)
    wzf = jnp.asarray(wz, F32)
    ox, oy, oz = fbm3_from3(wxf * F32(0.0470), wyf * F32(0.0470), wzf * F32(0.0470), octaves=3)
    px = wxf + ox * F32(30.0)
    py = wyf + oy * F32(24.0)
    pz = wzf + oz * F32(30.0)
    # overall cave biome scale is 1.0 in x/z and y

    n2x = px * F32(0.2)
    n2z = pz * F32(0.2)
    top_h = F32(bio.SEA_LEVEL) + F32(0.15) * (max_height - F32(bio.SEA_LEVEL))

    none_start = top_h - F32(19.0) + F32(23.0) * fbm2(n2x, n2z, octaves=3)
    none_end = none_start - F32(5.0) + F32(3.0) * fbm2(n2x + F32(3821.34), n2z + F32(4920.32), octaves=3)
    shallow_start = top_h - F32(72.0) + F32(18.0) * fbm2(n2x + F32(-4921.34), n2z + F32(8402.13), octaves=3)
    shallow_end = shallow_start - F32(10.0) + F32(7.0) * fbm2(n2x + F32(9411.32), n2z + F32(-3921.34), octaves=3)

    none = smoothstep(none_end, none_start, py)
    shallow = smoothstep(shallow_end, shallow_start, py)

    def single(scale, offx, offy, offz, thr):
        s = simplex3(
            px * F32(scale) + F32(offx), py * F32(scale) + F32(offy), pz * F32(scale) + F32(offz)
        )
        return smoothstep(-F32(thr), F32(thr), s)

    warped = single(0.0030, 5821.32, 4920.12, 7931.59, 0.05)
    rocky = single(0.0022, -9193.23, -6813.39, -2171.23, 0.05)
    return jnp.stack([none, shallow, warped, rocky], axis=-1)


def get_cave_biome(wx, wy, wz, max_height, seed: int):
    """getCaveBiome (biomeFuncs.hpp:201-220): weighted pick via one seeded u01 draw."""
    noise4 = cave_biome_noise(wx, wy, wz, max_height)
    weights = cave_biome_weights_from_noise(noise4)  # [..., 5]
    state = hashes.seed_4(jnp.asarray(wx, I32), jnp.asarray(wy, I32), jnp.asarray(wz, I32), seed)
    rand, _ = hashes.lcg_u01(state)
    running = jnp.cumsum(weights, axis=-1)
    picked = rand[..., None] - running <= F32(0.0)
    first = jnp.argmax(picked, axis=-1)
    any_picked = jnp.any(picked, axis=-1)
    return jnp.where(any_picked, first, I32(int(bio.CaveBiome.NONE))).astype(I32)


@jax.jit
def generate_caves(heightfield, biome_weights, chunk_pos):
    """Batched stage 4.

    Args:
      heightfield: [B, 16, 16] f32.
      biome_weights: [B, 24, 16, 16] f32.
      chunk_pos: [B, 2] int32.

    Returns dict of per-column cave layers (layout [B, z, x, layer]):
      starts [.., 32] i32 (384 = none; exclusive — block at start is solid),
      ends   [.., 32] i32 (384 = open to sky; inclusive — block at end is air),
      bottom_biome / top_biome [.., 32] i32 CaveBiome ids.
    """
    B = heightfield.shape[0]
    lx = jnp.arange(16, dtype=I32)
    ly = jnp.arange(Y_SIZE, dtype=I32)
    wx = chunk_pos[:, 0, None, None] + lx[None, None, :]  # [B, 1->z, x]
    wz = chunk_pos[:, 1, None, None] + lx[None, :, None]
    wx = jnp.broadcast_to(wx, (B, 16, 16))
    wz = jnp.broadcast_to(wz, (B, 16, 16))

    ocean_beach = jnp.sum(
        biome_weights[:, : bio.NUM_OCEAN_AND_BEACH_BIOMES], axis=1
    )  # [B, 16, 16]

    # carve-noise band: y in [0, CARVE_Y_MAX) — carved caves are provably absent
    # above (see CARVE_Y_MAX); ravine + above-surface terms are per-column and are
    # evaluated on a flattened [B, 256] column axis for full VPU lane utilization
    wy = ly[None, None, None, :]  # [1,1,1,384]
    wxf = wx[..., None].astype(F32)
    wzf = wz[..., None].astype(F32)
    wyb = wy[..., :CARVE_Y_MAX].astype(F32)
    carved_band = _carved(wxf, wyb, wzf, ocean_beach[..., None])
    carved_band = jnp.broadcast_to(carved_band, (B, 16, 16, CARVE_Y_MAX))
    carved = jnp.concatenate(
        [carved_band, jnp.zeros((B, 16, 16, Y_SIZE - CARVE_Y_MAX), bool)], axis=-1
    )
    above_surface = wy.astype(F32) > jnp.maximum(
        jnp.floor(heightfield[..., None]), F32(bio.SEA_LEVEL)
    )
    rav_min_y = _ravine_min_y(
        wx.astype(F32).reshape(B, 256),
        wz.astype(F32).reshape(B, 256),
        ocean_beach.reshape(B, 256),
    ).reshape(B, 16, 16)
    ravine = wy.astype(F32) > rav_min_y[..., None]
    cave = above_surface | carved | ravine
    cave = jnp.logical_and(wy != 0, cave)  # [B, 16, 16, 384]; True = air

    filled = jnp.logical_not(cave)
    next_filled = jnp.concatenate(
        [filled[..., 1:], jnp.zeros_like(filled[..., :1])], axis=-1
    )
    flips = filled != next_filled  # flip at y (chunk.cu:859-860)

    # compaction: flip ys ascending == flip order; non-flips sort to the back
    keys = jnp.where(flips, wy, I32(9999))
    keys = jnp.broadcast_to(keys, cave.shape)
    sorted_keys = jnp.sort(keys, axis=-1)[..., : 2 * MAX_LAYERS]
    starts = sorted_keys[..., 0::2]
    ends = sorted_keys[..., 1::2]
    starts = jnp.where(starts >= I32(Y_SIZE), I32(Y_SIZE), starts)
    ends = jnp.where(ends >= I32(Y_SIZE), I32(Y_SIZE), ends)

    # cave biomes at layer boundaries — evaluated on a flattened [B, 16, 512] layout
    # (the raw [B, 16, 16, 32] puts 32 on the 128-lane axis -> 1/4 utilization)
    shape4 = (B, 16, 16, MAX_LAYERS)
    flat = lambda a: jnp.broadcast_to(a, shape4).reshape(B, 16, 16 * MAX_LAYERS)
    max_h = flat(heightfield[..., None])
    wxl = flat(wx[..., None])
    wzl = flat(wz[..., None])
    valid_start = starts != I32(Y_SIZE)
    bottom = get_cave_biome(wxl, flat(starts), wzl, max_h, SEED_BOTTOM_BIOME).reshape(shape4)
    bottom = jnp.where(valid_start, bottom, I32(0))
    valid_end = ends != I32(Y_SIZE)
    top = get_cave_biome(wxl, flat(ends + I32(1)), wzl, max_h, SEED_TOP_BIOME).reshape(shape4)
    top = jnp.where(valid_end, top, I32(int(bio.CaveBiome.NONE)))

    return {"starts": starts, "ends": ends, "bottom_biome": bottom, "top_biome": top}
