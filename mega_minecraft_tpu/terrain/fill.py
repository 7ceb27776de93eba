"""Stage 5: chunk fill — block IDs for the full 16×384×16 volume, batched.

TPU-native equivalent of the reference's mega-kernel (reference behavior:
/root/reference/src/terrain/chunk.cu:1200-1510 ``kernFill`` / ``chunkFillPlaceBlock``
and biomeFuncs.hpp:385-707 biome pre/post-process + cave-biome post-process):
bedrock/air/water, cave carve (lava ≤ y 8), material-layer → block lookup, grass-block
top substitution, biome post-processing (mesa terracotta strata, snow caps, quartz
towers, mud, packed ice, mycelium, …), cave-biome wall coatings.  SDF feature
placement composes on top (features.py).

Design: one jitted elementwise program over ``[B, z, x, y]`` (y innermost, 384 = 3×128
lanes).  The reference's per-thread early-return cascade becomes a priority-ordered
sequence of masked selects applied once to the merged block volume (post-processing is
evaluated a single time on the cascaded result — same semantics, half the work of the
per-path application).  The per-block cave-layer scan becomes masked min/max
reductions over the ≤32 cave layers.  Block IDs are uint8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..ops.noise import fbm2, fbm3_from3, simplex2, simplex3, worley3
from ..world import biomes as bio
from ..world.blocks import Block

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8

Y_SIZE = 384
SEA_LEVEL = bio.SEA_LEVEL
LAVA_LEVEL = bio.LAVA_LEVEL
SEED_FILL_CAVE_BIOME = 190249401  # chunk.cu:1243
#: cave biome is provably CaveBiome::NONE at/above this y (proof at the callsite)
CAVE_BIOME_Y_MAX = 192

_B = Block


def _u8(b: Block):
    return U8(int(b))


def random_biome(biome_weights_last, rand):
    """getRandomBiome (biomeFuncs.hpp:39-53): first biome where the running weight sum
    exceeds rand; PLAINS fallback.  biome_weights_last: [..., 24] (broadcastable
    against rand[..., None]); rand: [...]. Returns int32 biome ids shaped like rand."""
    running = jnp.cumsum(biome_weights_last, axis=-1)
    picked = rand[..., None] - running <= F32(0.0)
    first = jnp.argmax(picked, axis=-1)
    return jnp.where(
        jnp.any(picked, axis=-1), first, I32(int(bio.Biome.PLAINS))
    ).astype(I32)


def _cave_depths(starts, ends, y):
    """Replicates the per-block cave-layer scan (chunk.cu:1258-1294).

    starts/ends: [..., 1, 32] int32 per column; y: [..., Y, 1].
    Returns (in_cave, bottom_depth, top_depth) with shapes [..., Y].
    """
    valid = starts != I32(Y_SIZE)
    contain = valid & (starts < y) & (y <= ends)
    in_cave = jnp.any(contain, axis=-1)
    c_start = jnp.max(jnp.where(contain, starts, I32(-1)), axis=-1)
    c_end = jnp.max(jnp.where(contain, ends, I32(-1)), axis=-1)

    above = valid & (starts >= y)
    has_above = jnp.any(above, axis=-1)
    above_min = jnp.min(jnp.where(above, starts, I32(9999)), axis=-1)

    below = valid & (ends < y)
    has_below = jnp.any(below, axis=-1)
    below_max = jnp.max(jnp.where(below, ends, I32(-9999)), axis=-1)

    yq = y[..., 0]
    bottom = jnp.where(
        in_cave,
        c_start - yq,
        jnp.where(has_above, above_min - yq, I32(-Y_SIZE)),
    )
    top = jnp.where(
        in_cave,
        yq - (c_end + I32(1)),
        jnp.where(has_below, yq - (below_max + I32(1)), I32(-Y_SIZE)),
    )
    return in_cave, bottom, top


# ---------------------------------------------------------------------------
# Biome pre/post-process (biomeFuncs.hpp:385-590).
# Shapes: block / rand_biome / is_top: [.., Y]; wx/wz: [..] per-column f32;
# wy: [.., Y] int; height: [.., 1] f32.
# ---------------------------------------------------------------------------


def _biome_preprocess_hit(rand_biome, wx, wyf, wz, height):
    """CRYSTALS quartz towers (biomeFuncs.hpp:385-406) — returns hit mask [.., Y]."""
    quartz_start = F32(140.0) + F32(15.0) * fbm2(wx * F32(0.0080), wz * F32(0.0080), octaves=3)
    return (
        (rand_biome == I32(int(bio.Biome.CRYSTALS)))
        & (height > F32(176.0))
        & (wyf > quartz_start[..., None])
    )


def _biome_postprocess(block, rand_biome, wx, wyf, wz, is_top):
    def biome_is(b):
        return rand_biome == I32(int(b))

    wy_int_ge_sea = wyf >= F32(SEA_LEVEL)

    # ARCHIPELAGO: dirt/grass skin above a noisy dirt height
    dirt_h = F32(SEA_LEVEL) + F32(1.5) + F32(1.7) * fbm2(wx * F32(0.0065), wz * F32(0.0065), octaves=3)
    arch = (
        biome_is(bio.Biome.ARCHIPELAGO)
        & wy_int_ge_sea
        & (block != _u8(_B.WATER))
        & (wyf > dirt_h[..., None])
    )
    block = jnp.where(arch, jnp.where(is_top, _u8(_B.GRASS_BLOCK), _u8(_B.DIRT)), block)

    # TROPICAL_BEACH / BEACH top-sand skins
    trop = (
        biome_is(bio.Biome.TROPICAL_BEACH)
        & is_top
        & (block != _u8(_B.SMOOTH_SAND))
        & (block != _u8(_B.WATER))
    )
    block = jnp.where(trop, _u8(_B.SMOOTH_SAND), block)
    beach = (
        biome_is(bio.Biome.BEACH)
        & is_top
        & (block != _u8(_B.SAND))
        & (block != _u8(_B.WATER))
    )
    block = jnp.where(beach, _u8(_B.SAND), block)

    # MESA terracotta strata
    tsh = (F32(108.0) + F32(12.0) * fbm2(wx * F32(0.0040), wz * F32(0.0040), octaves=3))[..., None]
    zero_y = jnp.zeros_like(wyf)
    sample_h = (
        wyf
        + F32(3.0)
        * simplex3(
            wx[..., None] * F32(0.0100) + zero_y,
            wz[..., None] * F32(0.0100) + zero_y,
            wyf * F32(0.0300),
        )
        - tsh
    )
    sample_h = sample_h - jnp.floor(sample_h / F32(32.0)) * F32(32.0)
    terr = jnp.where(
        sample_h < F32(5.0), _u8(_B.TERRACOTTA),
        jnp.where(sample_h < F32(8.0), _u8(_B.ORANGE_TERRACOTTA),
        jnp.where(sample_h < F32(12.0), _u8(_B.RED_TERRACOTTA),
        jnp.where(sample_h < F32(14.0), _u8(_B.WHITE_TERRACOTTA),
        jnp.where(sample_h < F32(20.0), _u8(_B.TERRACOTTA),
        jnp.where(sample_h < F32(21.0), _u8(_B.ORANGE_TERRACOTTA),
        jnp.where(sample_h < F32(26.0), _u8(_B.YELLOW_TERRACOTTA),
        jnp.where(sample_h < F32(29.0), _u8(_B.PURPLE_TERRACOTTA),
                  _u8(_B.TERRACOTTA)))))))))
    mesa = (
        biome_is(bio.Biome.MESA)
        & (wyf >= F32(90.0))
        & (block != _u8(_B.WATER))
        & (wyf >= tsh)
        & ~((block == _u8(_B.CLAY)) & (wyf < tsh + F32(20.0)))
    )
    block = jnp.where(mesa, terr, block)

    # FROZEN_WASTELAND: water -> packed ice
    frozen = biome_is(bio.Biome.FROZEN_WASTELAND) & (block == _u8(_B.WATER))
    block = jnp.where(frozen, _u8(_B.PACKED_ICE), block)

    # SHREKS_SWAMP mud band
    mud_end = F32(SEA_LEVEL) + F32(0.8) + F32(1.1) * simplex2(wx * F32(0.0300), wz * F32(0.0300))
    swamp = (
        biome_is(bio.Biome.SHREKS_SWAMP)
        & (wyf >= F32(100.0))
        & ((block == _u8(_B.DIRT)) | (block == _u8(_B.JUNGLE_GRASS_BLOCK)))
        & (wyf < mud_end[..., None])
    )
    block = jnp.where(swamp, _u8(_B.MUD), block)

    # TIANZI smooth sandstone pillars
    ssh = F32(112.0) + F32(16.0) * fbm2(wx * F32(0.0200), wz * F32(0.0200), octaves=3)
    tianzi = (
        biome_is(bio.Biome.TIANZI_MOUNTAINS)
        & (wyf >= F32(90.0))
        & (block != _u8(_B.WATER))
        & (block != _u8(_B.DIRT))
        & (block != _u8(_B.GRASS_BLOCK))
        & (wyf >= ssh[..., None])
    )
    block = jnp.where(tianzi, _u8(_B.SMOOTH_SANDSTONE), block)

    # CRYSTALS mycelium specks on top blocks
    myc_rand = hashes.rand1_from2(wx + F32(913213.0), wz + F32(85941.0))
    crys = (
        biome_is(bio.Biome.CRYSTALS)
        & is_top
        & (block != _u8(_B.QUARTZ))
        & (myc_rand < F32(0.1))[..., None]
    )
    block = jnp.where(crys, _u8(_B.MYCELIUM), block)

    # MOUNTAINS snow caps
    snow_h = F32(202.0) + F32(5.0) * fbm2(wx * F32(0.0500), wz * F32(0.0500), octaves=3)
    mount = (
        biome_is(bio.Biome.MOUNTAINS)
        & (wyf >= F32(190.0))
        & (wyf >= snow_h[..., None])
    )
    block = jnp.where(mount, _u8(_B.SNOW), block)

    return block


def _cave_biome_postprocess(block, cave_biome, wx, wyf, wz, bottom_depth, top_depth):
    """caveBiomeBlockPostProcess (biomeFuncs.hpp:592-707)."""
    zero_y = jnp.zeros_like(wyf)
    wxy = wx[..., None] + zero_y
    wzy = wz[..., None] + zero_y

    def cb_is(b):
        return cave_biome == I32(int(b))

    is_top = bottom_depth == I32(0)
    stone_like = (
        (block == _u8(_B.STONE))
        | (block == _u8(_B.DEEPSLATE))
        | (block == _u8(_B.BLACKSTONE))
    )

    # CRYSTAL_CAVES: quartz veins + cobble speckle
    qn = simplex3(
        (wxy + wyf) * F32(0.05),
        (wzy + F32(5819323.0)) * F32(0.05),
        ((wxy + wzy) * F32(2.0)) * F32(0.05),
    )
    cc = cb_is(bio.CaveBiome.CRYSTAL_CAVES) & stone_like
    quartz = cc & (qn < F32(-0.25))
    cobble_rand = hashes.rand1_from3(wxy, wyf, wzy)
    cobble_stone = cc & ~quartz & (block == _u8(_B.STONE)) & (cobble_rand < F32(0.5))
    cobble_deep = cc & ~quartz & (block == _u8(_B.DEEPSLATE)) & (cobble_rand < F32(0.4))
    block = jnp.where(quartz, _u8(_B.QUARTZ), block)
    block = jnp.where(cobble_stone, _u8(_B.COBBLESTONE), block)
    block = jnp.where(cobble_deep, _u8(_B.COBBLED_DEEPSLATE), block)

    # LUSH_CAVES: clay/moss coating near cave boundaries
    nx = wxy * F32(0.025)
    ny = wyf * F32(0.025)
    nz = wzy * F32(0.025)
    thr = F32(1.5) + F32(4.5) * simplex3(nx, ny, nz)
    bd = bottom_depth.astype(F32)
    td = top_depth.astype(F32)
    near = ((bd >= F32(0.0)) & (bd <= thr)) | ((td >= F32(0.0)) & (td <= thr))
    ny2 = ny + F32(192031.9821)
    ox, oy, oz = fbm3_from3(nx * F32(0.4), ny2 * F32(0.4), nz * F32(0.4), octaves=3)
    clay_n = worley3(nx + ox * F32(2.0), ny2 + oy * F32(2.0), nz + oz * F32(2.0))["f1"]
    lush = cb_is(bio.CaveBiome.LUSH_CAVES) & stone_like & near
    block = jnp.where(
        lush, jnp.where(clay_n < F32(0.25), _u8(_B.CLAY), _u8(_B.MOSS)), block
    )

    # WARPED/AMBER forests: cave-floor substitutions
    for cb, deep, blackst in (
        (bio.CaveBiome.WARPED_FOREST, _B.WARPED_DEEPSLATE, _B.WARPED_BLACKSTONE),
        (bio.CaveBiome.AMBER_FOREST, _B.AMBER_DEEPSLATE, _B.AMBER_BLACKSTONE),
    ):
        m = cb_is(cb) & is_top
        block = jnp.where(m & (block == _u8(_B.DEEPSLATE)), _u8(deep), block)
        block = jnp.where(m & (block == _u8(_B.BLACKSTONE)), _u8(blackst), block)

    return block


@jax.jit
def fill_chunks(heightfield, biome_weights, layers, cave_starts, cave_ends, chunk_pos):
    """Batched stage 5 (terrain body only; features compose on top).

    Args:
      heightfield: [B, 16, 16] f32 ([z, x]).
      biome_weights: [B, 24, 16, 16] f32.
      layers: [B, 20, 16, 16] f32 (erosion-fixed absolute starts).
      cave_starts / cave_ends: [B, 16, 16, 32] i32.
      chunk_pos: [B, 2] i32 world-block origin.

    Returns blocks [B, 16, 16, 384] uint8 ([z, x, y]).
    """
    from .caves import get_cave_biome  # local import to avoid cycle

    B = heightfield.shape[0]
    lx = jnp.arange(16, dtype=I32)
    wx = jnp.broadcast_to(chunk_pos[:, 0, None, None] + lx[None, None, :], (B, 16, 16))
    wz = jnp.broadcast_to(chunk_pos[:, 1, None, None] + lx[None, :, None], (B, 16, 16))
    y = jnp.arange(Y_SIZE, dtype=I32)
    wy = jnp.broadcast_to(y, (B, 16, 16, Y_SIZE))
    wyf = wy.astype(F32)
    zero_y = jnp.zeros_like(wy)

    hf = heightfield[..., None]  # [B, 16, 16, 1]
    wxf = wx.astype(F32)
    wzf = wz.astype(F32)

    # per-block seeded RNG: first u01 draw picks the random biome (chunk.cu:1433-1436).
    # The weighted pick unrolls over the 24 biomes with [.., Y]-shaped selects (the
    # y axis is the 3x128-lane minor dim) instead of a trailing-24 cumsum/argmax,
    # whose 24-wide minor axis runs the VPU at ~1/6 lane utilization.
    state = hashes.seed_3(wx[..., None] + zero_y, wy, wz[..., None] + zero_y)
    u, _ = hashes.lcg_u01(state)
    grass_tab = np.asarray(bio.GRASS_BLOCKS)
    running = jnp.zeros((B, 16, 16, 1), F32)
    rand_biome = jnp.full((B, 16, 16, Y_SIZE), I32(int(bio.Biome.PLAINS)))
    picked = jnp.zeros((B, 16, 16, Y_SIZE), bool)
    grass = jnp.full((B, 16, 16, Y_SIZE), U8(int(grass_tab[int(bio.Biome.PLAINS)])))
    for b in range(bio.NUM_BIOMES):
        running = running + biome_weights[:, b, :, :, None]
        cond = (u - running) <= F32(0.0)
        take = cond & ~picked
        rand_biome = jnp.where(take, I32(b), rand_biome)
        grass = jnp.where(take, U8(int(grass_tab[b])), grass)
        picked = picked | cond

    is_ocean = jnp.any(
        biome_weights[:, : bio.NUM_OCEAN_BIOMES] > F32(0.0), axis=1
    )[..., None]  # [B, 16, 16, 1]

    in_cave, bottom_d, top_d = _cave_depths(
        cave_starts[..., None, :], cave_ends[..., None, :], wy[..., None]
    )

    above_ground = wyf > hf
    is_top = wyf >= hf - F32(1.0)

    # --- terrain body block (layer lookup + grass) ---
    # first material layer containing y wins (chunk.cu:1296-1330), unrolled over the
    # 20 materials with [.., Y]-shaped selects (see the biome-pick note above; the
    # trailing-20 in_layer/argmax formulation ran ~10x slower on the VPU)
    n_fwd = bio.NUM_FORWARD_MATERIALS
    mat_block = np.asarray(bio.MATERIAL_BLOCK)
    # search-start restriction (chunk.cu:1303-1311): skip forward materials when
    # y is at/above the backward-stratified base
    fwd_ok = wyf < layers[:, n_fwd, :, :, None]
    body = jnp.full((B, 16, 16, Y_SIZE), U8(int(mat_block[0])))
    found = jnp.zeros((B, 16, 16, Y_SIZE), bool)
    for m in range(bio.NUM_MATERIALS):
        start = layers[:, m, :, :, None]
        end = layers[:, m + 1, :, :, None] if m + 1 < bio.NUM_MATERIALS else hf
        cond = (start <= wyf) & (wyf < end)
        if m < n_fwd:
            cond = cond & fwd_ok
        take = cond & ~found
        body = jnp.where(take, U8(int(mat_block[m])), body)
        found = found | take

    body = jnp.where((body == _u8(_B.DIRT)) & is_top, grass, body)

    pre_hit = _biome_preprocess_hit(rand_biome, wxf, wyf, wzf, hf)
    body = jnp.where(pre_hit, _u8(_B.QUARTZ), body)

    # --- priority cascade (reverse of the reference's early returns) ---
    cave_air = jnp.where(wy <= I32(LAVA_LEVEL), _u8(_B.LAVA), _u8(_B.AIR))
    is_water_zone = above_ground & (wy <= I32(SEA_LEVEL))
    cave_mask = in_cave & ~(is_water_zone & is_ocean) & ~(above_ground & (wy > I32(SEA_LEVEL)))
    water_mask = is_water_zone & ~(in_cave & ~is_ocean)
    bedrock_mask = wy == I32(0)
    air_mask = above_ground & (wy > I32(SEA_LEVEL))
    solid_mask = ~above_ground & ~cave_mask & ~bedrock_mask

    block = body
    block = jnp.where(cave_mask, cave_air, block)
    block = jnp.where(water_mask, jnp.broadcast_to(_u8(_B.WATER), block.shape), block)
    block = jnp.where(air_mask, _u8(_B.AIR), block)
    block = jnp.where(bedrock_mask, _u8(_B.BEDROCK), block)

    # --- post-processing, applied once to the merged volume ---
    # biome post-process runs for solid and water blocks (not bedrock/air/cave)
    post_mask = (solid_mask | water_mask) & ~cave_mask
    post = _biome_postprocess(block, rand_biome, wxf, wyf, wzf, is_top)
    block = jnp.where(post_mask, post, block)

    # cave-biome post-process runs for solid, non-pre-processed blocks.
    # Evaluated on the y < CAVE_BIOME_Y_MAX band only: getCaveBiome's weight scan
    # (biomeFuncs.hpp:201-219) visits NONE first with weight == the `none` noise
    # channel, which is smoothstep(...)==1.0 exactly whenever the warped sample
    # py >= none_start; py >= wy - 24*0.875 and none_start <= top_h - 19 + 23*0.875
    # with top_h <= 128 + 0.15*(384-128), so every y >= 192 deterministically picks
    # CaveBiome::NONE — and NONE post-process is the identity (biomeFuncs.hpp:594).
    yb = CAVE_BIOME_Y_MAX
    zero_b = zero_y[..., :yb]
    cave_biome_band = get_cave_biome(
        wx[..., None] + zero_b, wy[..., :yb], wz[..., None] + zero_b, hf,
        SEED_FILL_CAVE_BIOME,
    )
    cave_post_band = _cave_biome_postprocess(
        block[..., :yb], cave_biome_band, wxf, wyf[..., :yb], wzf,
        bottom_d[..., :yb], top_d[..., :yb],
    )
    block_band = jnp.where(
        (solid_mask & ~pre_hit)[..., :yb], cave_post_band, block[..., :yb]
    )
    block = jnp.concatenate([block_band, block[..., yb:]], axis=-1)

    return block
