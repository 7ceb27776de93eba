"""Stage 1: heightfield + surface biome weights, batched over chunks.

TPU-native equivalent of the reference's heightfield kernel (reference behavior:
/root/reference/src/terrain/chunk.cu:150-229 ``kernGenerateHeightfield`` and
biomeFuncs.hpp:104-199 biome noise / weights, 224-383 per-biome height formulas).

Design: instead of one CUDA thread per column, the whole batch is a single jitted
elementwise program over ``[B, 16, 16]`` coordinate arrays — every noise evaluation is
(8,128)-vectorizable VPU math and XLA fuses the entire stage into a few kernels.  All
24 biome heights are evaluated for every column and combined with a masked weighted
sum, which on SIMD hardware costs the same as the reference's per-thread ``weight > 0``
branch and keeps the program branch-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.noise import (
    fbm2,
    fbm2_from2,
    simplex2,
    simplex2_from2,
    smoothstep,
    worley2,
)
from ..world import biomes as bio
from ..world.biomes import Biome

F32 = jnp.float32


def _f(x):
    return jnp.asarray(x, F32)


# ---------------------------------------------------------------------------
# Biome noise field (biomeFuncs.hpp:109-128): 6 channels from domain-warped simplex.
# ---------------------------------------------------------------------------


def biome_noise(wx, wz):
    """Per-column biome noise attributes. Returns [..., 6] stacked channels
    (ocean, beach, rocky, magic, temperature, moisture)."""
    wx = _f(wx)
    wz = _f(wz)
    ox, oz = fbm2_from2(wx * F32(0.0150), wz * F32(0.0150), octaves=3)
    px = (wx + ox * F32(20.0)) * F32(bio.OVERALL_BIOME_SCALE)
    pz = (wz + oz * F32(20.0)) * F32(bio.OVERALL_BIOME_SCALE)

    def single(scale, off_x, off_z, thr):
        s = simplex2(px * F32(scale) + F32(off_x), pz * F32(scale) + F32(off_z))
        return smoothstep(-thr, thr, s)

    ocean_noise = simplex2(px * F32(0.0007) + F32(2853.49), pz * F32(0.0007) + F32(-9481.42))
    ocean = smoothstep(F32(0.01), F32(-0.02), ocean_noise)
    beach = smoothstep(F32(-0.15), F32(-0.05), ocean_noise)
    rocky = single(0.0015, -8102.35, -7620.23, 0.08)
    magic = single(0.0030, 5612.35, 9182.49, 0.07)
    temperature = single(0.0012, -4021.34, -8720.12, 0.06)
    moisture = single(0.0050, 1835.32, 3019.39, 0.12)
    return jnp.stack([ocean, beach, rocky, magic, temperature, moisture], axis=-1)


def biome_weights_from_noise(noise6):
    """Multiplicative biome weights from the 6-channel noise field.

    noise6: [..., 6]  ->  [..., NUM_BIOMES]
    weight_b = Π_c f(noise_c) with f = id / (1-x) / 1 per the weight-type table
    (biomeFuncs.hpp:158-185).  The product unrolls statically per biome in the
    reference's sequential channel order (getBiomeWeight, biomeFuncs.hpp:170-185) —
    ignored channels are skipped instead of multiplying by 1, and no [.., 24, 6]
    intermediate (whose 6-wide minor axis wastes the VPU's 128 lanes) is formed.
    """
    table = np.asarray(bio.BIOME_NOISE_WEIGHTS)  # [24, 6] in {0(ignore),1(pos),2(neg)}
    cols = []
    for b in range(bio.NUM_BIOMES):
        w = None
        for c in range(table.shape[1]):
            t = int(table[b, c])
            if t == 0:
                continue
            term = noise6[..., c] if t == 1 else F32(1.0) - noise6[..., c]
            w = term if w is None else w * term
        cols.append(jnp.ones(noise6.shape[:-1], F32) if w is None else w)
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# Per-biome height formulas (biomeFuncs.hpp:224-383), written 1:1 against the
# reference's constants.  Each takes world-space (x, z) arrays and returns heights.
# ---------------------------------------------------------------------------


def _h_coral_reef(x, z):
    return F32(107.0) + F32(16.0) * fbm2(x * F32(0.0065), z * F32(0.0065))


def _h_archipelago(x, z):
    island = (fbm2(x * F32(0.0055), z * F32(0.0055), octaves=4) + F32(1.0)) * F32(0.5)
    island = jnp.power(island, F32(2.4))
    island = smoothstep(F32(1.0), F32(0.0), island)
    base = F32(107.0) + F32(24.0) * fbm2(x * F32(0.0060), z * F32(0.0060))
    return base + F32(22.0) * island


def _h_warm_ocean(x, z):
    return F32(93.0) + F32(18.0) * fbm2(x * F32(0.0055), z * F32(0.0055))


def _h_icebergs(x, z):
    return F32(66.0) + F32(18.0) * fbm2(x * F32(0.0060), z * F32(0.0060))


def _h_cool_ocean(x, z):
    return F32(80.0) + F32(22.0) * fbm2(x * F32(0.0065), z * F32(0.0065))


def _h_rocky_beach(x, z):
    return F32(134.0) + F32(8.0) * fbm2(x * F32(0.0070), z * F32(0.0070))


def _h_tropical_beach(x, z):
    return F32(129.5) + F32(6.0) * fbm2(x * F32(0.0045), z * F32(0.0045))


def _h_beach(x, z):
    return F32(132.0) + F32(5.0) * fbm2(x * F32(0.0055), z * F32(0.0055))


def _h_savanna(x, z):
    ox, oz = fbm2_from2(x * F32(0.0040), z * F32(0.0040), octaves=5)
    nx = x + ox * F32(100.0)
    nz = z + oz * F32(100.0)
    p1 = worley2(nx * F32(0.0070), nz * F32(0.0070))["f1"]
    p1 = smoothstep(F32(0.30), F32(0.20), p1) * (
        F32(1.0) + F32(0.3) * simplex2(nx * F32(0.0100), nz * F32(0.0100))
    )
    p2 = worley2((nx + F32(-3910.12)) * F32(0.0045), (nz + F32(-9012.34)) * F32(0.0045))["f1"]
    p2 = smoothstep(F32(0.16), F32(0.08), p2) * (
        F32(1.0) + F32(0.2) * simplex2(nx * F32(0.0130), nz * F32(0.0130))
    )
    plateau = p1 * F32(14.0) + p2 * F32(9.0)
    return F32(136.0) + F32(9.0) * fbm2(x * F32(0.0080), z * F32(0.0080), octaves=4) + plateau


def _h_mesa(x, z):
    x = x * F32(0.7)
    z = z * F32(0.7)
    ox, oz = fbm2_from2(x * F32(0.0050), z * F32(0.0050), octaves=5)
    ox = ox * F32(300.0)
    oz = oz * F32(300.0)
    river = worley2((x + ox) * F32(0.0030), (z + oz) * F32(0.0030), want_edge=True)["edge"]
    base = F32(122.0)
    base = base + F32(10.0) * smoothstep(F32(0.00), F32(0.05), river)
    base = base + (
        F32(37.5)
        + F32(5.0)
        * fbm2((x + F32(0.02) * ox) * F32(0.0300), (z + F32(0.02) * oz) * F32(0.0300), octaves=4)
    ) * smoothstep(F32(0.07), F32(0.22), river)
    return base + F32(6.0) * simplex2(x * F32(0.0250), z * F32(0.0250))


def _h_frozen_wasteland(x, z):
    return F32(136.0) + F32(16.0) * fbm2(x * F32(0.0035), z * F32(0.0035))


def _h_redwood_forest(x, z):
    return F32(134.0) + F32(8.0) * fbm2(x * F32(0.0120), z * F32(0.0120))


def _h_shreks_swamp(x, z):
    return F32(130.0) + F32(12.0) * fbm2(x * F32(0.0080), z * F32(0.0080))


def _h_sparse_desert(x, z):
    ox, oz = simplex2_from2(x * F32(0.0080), z * F32(0.0080))
    dunes = jnp.power(
        worley2((x + ox * F32(20.0)) * F32(0.0160), (z + oz * F32(20.0)) * F32(0.0160))["f1"],
        F32(2.0),
    ) * F32(18.0)
    return F32(132.0) + F32(4.0) * fbm2(x * F32(0.0070), z * F32(0.0070), octaves=4) + dunes


def _h_lush_birch_forest(x, z):
    hills = (simplex2(x * F32(0.0012), z * F32(0.0012)) + F32(0.8)) * F32(20.0)
    return F32(135.0) + F32(8.0) * fbm2(x * F32(0.0090), z * F32(0.0090)) + hills


def _h_tianzi_mountains(x, z):
    ox, oz = simplex2_from2(x * F32(0.0800), z * F32(0.0800))
    nx = (x + ox * F32(3.0)) * F32(0.0150)
    nz = (z + oz * F32(3.0)) * F32(0.0150)
    w1 = smoothstep(F32(0.45), F32(0.35), worley2(nx, nz)["f1"]) * F32(1.2)
    w2 = smoothstep(
        F32(0.45),
        F32(0.35),
        worley2(nx * F32(1.4) + F32(4292.12), nz * F32(1.4) + F32(9183.27))["f1"],
    ) * F32(0.6)
    mountains = (w1 + w2) * (
        F32(54.0) + F32(7.0) * fbm2(nx * F32(1.7), nz * F32(1.7), octaves=3)
    )
    hills = F32(16.0) * simplex2(x * F32(0.0150), z * F32(0.0150))
    return (
        F32(128.0)
        + hills
        + F32(9.0) * fbm2(x * F32(0.0070), z * F32(0.0070), octaves=3)
        + mountains
    )


def _h_jungle(x, z):
    hills = (simplex2(x * F32(0.0030), z * F32(0.0030)) + F32(0.5)) * F32(25.0)
    return F32(139.0) + F32(8.0) * fbm2(x * F32(0.0120), z * F32(0.0120)) + hills


def _h_red_desert(x, z):
    return F32(137.0) + F32(13.0) * fbm2(x * F32(0.0075), z * F32(0.0075))


def _h_purple_mushrooms(x, z):
    return F32(136.0) + F32(9.0) * fbm2(x * F32(0.0140), z * F32(0.0140))


def _h_crystals(x, z):
    base_noise = simplex2(x * F32(0.0030), z * F32(0.0030))
    w = worley2(x * F32(0.0700), z * F32(0.0700), want_color=True, want_edge=True)
    towers = smoothstep(F32(0.10), F32(0.15), w["edge"])
    towers = towers * (F32(0.4) + F32(1.2) * w["color"][0])
    height = F32(60.0) * towers * smoothstep(F32(0.70), F32(0.74), base_noise)
    height = height + F32(18.0) * smoothstep(F32(0.35), F32(0.8), base_noise)
    return F32(137.0) + F32(8.0) * fbm2(x * F32(0.0200), z * F32(0.0200)) + height


def _h_oasis(x, z):
    return F32(132.0) + F32(9.0) * fbm2(x * F32(0.0120), z * F32(0.0120))


def _h_desert(x, z):
    return F32(136.0) + F32(6.0) * fbm2(x * F32(0.0110), z * F32(0.0110))


def _h_plains(x, z):
    return F32(144.0) + F32(8.0) * fbm2(x * F32(0.0080), z * F32(0.0080))


def _h_mountains(x, z):
    n = jnp.power(jnp.abs(fbm2(x * F32(0.0035), z * F32(0.0035))) + F32(0.05), F32(2.0))
    n = n + ((fbm2(x * F32(0.0050), z * F32(0.0050)) - F32(0.5)) * F32(2.0)) * F32(0.05)
    return (
        F32(165.0)
        + F32(140.0) * (n - F32(0.15))
        + n * (F32(20.0) * fbm2(x * F32(0.0350), z * F32(0.0350)))
    )


HEIGHT_FNS = {
    Biome.CORAL_REEF: _h_coral_reef,
    Biome.ARCHIPELAGO: _h_archipelago,
    Biome.WARM_OCEAN: _h_warm_ocean,
    Biome.ICEBERGS: _h_icebergs,
    Biome.COOL_OCEAN: _h_cool_ocean,
    Biome.ROCKY_BEACH: _h_rocky_beach,
    Biome.TROPICAL_BEACH: _h_tropical_beach,
    Biome.BEACH: _h_beach,
    Biome.SAVANNA: _h_savanna,
    Biome.MESA: _h_mesa,
    Biome.FROZEN_WASTELAND: _h_frozen_wasteland,
    Biome.REDWOOD_FOREST: _h_redwood_forest,
    Biome.SHREKS_SWAMP: _h_shreks_swamp,
    Biome.SPARSE_DESERT: _h_sparse_desert,
    Biome.LUSH_BIRCH_FOREST: _h_lush_birch_forest,
    Biome.TIANZI_MOUNTAINS: _h_tianzi_mountains,
    Biome.JUNGLE: _h_jungle,
    Biome.RED_DESERT: _h_red_desert,
    Biome.PURPLE_MUSHROOMS: _h_purple_mushrooms,
    Biome.CRYSTALS: _h_crystals,
    Biome.OASIS: _h_oasis,
    Biome.DESERT: _h_desert,
    Biome.PLAINS: _h_plains,
    Biome.MOUNTAINS: _h_mountains,
}


def column_world_coords(chunk_pos):
    """chunk_pos [B, 2] int32 (world-block x, z of chunk origin) -> wx, wz [B, 16, 16]
    f32 world coordinates with local x fastest (layout [B, z, x])."""
    lx = jnp.arange(16, dtype=jnp.int32)
    lz = jnp.arange(16, dtype=jnp.int32)
    wx = chunk_pos[:, 0, None, None] + lx[None, None, :]
    wz = chunk_pos[:, 1, None, None] + lz[None, :, None]
    return wx.astype(F32), wz.astype(F32)


@partial(jax.jit, static_argnames=("biome_override",))
def generate_heightfield(chunk_pos, biome_override: int | None = None):
    """Batched stage 1.

    Args:
      chunk_pos: [B, 2] int32 world-block (x, z) of each chunk's origin.
      biome_override: optional Biome index forced to weight 1 (DEBUG_BIOME_OVERRIDE).

    Returns:
      heightfield [B, 16, 16] f32 (layout [B, z, x]),
      biome_weights [B, 24, 16, 16] f32.
    """
    wx, wz = column_world_coords(chunk_pos)
    B = wx.shape[0]
    # flatten columns to [B, 256]: the 2x128-lane minor axis runs the VPU at full
    # utilization (a [B, 16, 16] layout puts 16 on the lane axis -> 1/8 utilization)
    wx = jnp.broadcast_to(wx, (B, 16, 16)).reshape(B, 256)
    wz = jnp.broadcast_to(wz, (B, 16, 16)).reshape(B, 256)
    noise6 = biome_noise(wx, wz)  # [B, 256, 6]
    weights = biome_weights_from_noise(noise6)  # [B, 256, 24]
    if biome_override is not None:
        onehot = jnp.zeros((bio.NUM_BIOMES,), F32).at[int(biome_override)].set(1.0)
        weights = jnp.broadcast_to(onehot, weights.shape)

    height = jnp.zeros(wx.shape, F32)
    for biome, fn in HEIGHT_FNS.items():
        w = weights[..., int(biome)]
        height = height + jnp.where(w > F32(0.0), w * fn(wx, wz), F32(0.0))

    return (
        height.reshape(B, 16, 16),
        jnp.moveaxis(weights, -1, 1).reshape(B, 24, 16, 16),
    )


def heightfield_single(chunk_x: int, chunk_z: int):
    """Convenience: one chunk at chunk coords (x, z) -> (height [16,16], weights [24,16,16])."""
    pos = jnp.asarray(np.array([[chunk_x * 16, chunk_z * 16]], np.int32))
    h, w = generate_heightfield(pos)
    return h[0], w[0]
