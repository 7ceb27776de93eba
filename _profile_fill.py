"""Ablation profile of fill_chunks internals on the real chip (profiling only)."""
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from functools import partial

from mega_minecraft_tpu.ops import hashes
from mega_minecraft_tpu.terrain import caves as caves_mod
from mega_minecraft_tpu.terrain import heightfield, layers
from mega_minecraft_tpu.terrain import fill as fill_mod
from mega_minecraft_tpu.terrain.fill import (
    CAVE_BIOME_Y_MAX, LAVA_LEVEL, SEA_LEVEL, SEED_FILL_CAVE_BIOME, Y_SIZE,
    _B, _biome_postprocess, _biome_preprocess_hit, _cave_biome_postprocess,
    _cave_depths, _u8, random_biome,
)
from mega_minecraft_tpu.world import biomes as bio

F32, I32, U8 = jnp.float32, jnp.int32, jnp.uint8

n = 5
pos_h = []
for cz in range(-1, n + 1):
    for cx in range(-1, n + 1):
        pos_h.append([cx * 16, cz * 16])
pos_h = jnp.asarray(np.array(pos_h, np.int32))
hf_all, w_all = heightfield.generate_heightfield(pos_h)
hz = hx = n + 2
hf_grid = hf_all.reshape(hz, hx, 16, 16)
full = jnp.transpose(hf_grid, (0, 2, 1, 3)).reshape(hz * 16, hx * 16)
gathered = jnp.stack(
    [full[(iz + 1) * 16 - 1 : (iz + 1) * 16 + 17, (ix + 1) * 16 - 1 : (ix + 1) * 16 + 17]
     for iz in range(n) for ix in range(n)]
)
inner = jnp.asarray(np.array([(iz + 1) * hx + ix + 1 for iz in range(n) for ix in range(n)], np.int32))
w_in, hf_in, pos_in = w_all[inner], hf_all[inner], pos_h[inner]
ls = layers.fix_backward_stratified(layers.generate_layers(gathered, w_in, pos_in))
cv = caves_mod.generate_caves(hf_in, w_in, pos_in)
args = (hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in)


@partial(jax.jit, static_argnames=("mode",))
def fill_ablate(heightfield, biome_weights, layers, cave_starts, cave_ends, chunk_pos, mode="full"):
    from mega_minecraft_tpu.terrain.caves import get_cave_biome

    B = heightfield.shape[0]
    lx = jnp.arange(16, dtype=I32)
    wx = jnp.broadcast_to(chunk_pos[:, 0, None, None] + lx[None, None, :], (B, 16, 16))
    wz = jnp.broadcast_to(chunk_pos[:, 1, None, None] + lx[None, :, None], (B, 16, 16))
    y = jnp.arange(Y_SIZE, dtype=I32)
    wy = jnp.broadcast_to(y, (B, 16, 16, Y_SIZE))
    wyf = wy.astype(F32)
    zero_y = jnp.zeros_like(wy)
    hf = heightfield[..., None]
    wxf = wx.astype(F32)
    wzf = wz.astype(F32)

    if mode == "randbiome_only":
        state = hashes.seed_3(wx[..., None] + zero_y, wy, wz[..., None] + zero_y)
        u, _ = hashes.lcg_u01(state)
        w_last = jnp.moveaxis(biome_weights, 1, -1)
        return random_biome(w_last[..., None, :], u).astype(jnp.uint8)

    state = hashes.seed_3(wx[..., None] + zero_y, wy, wz[..., None] + zero_y)
    u, _ = hashes.lcg_u01(state)
    w_last = jnp.moveaxis(biome_weights, 1, -1)
    rand_biome = random_biome(w_last[..., None, :], u)
    is_ocean = jnp.any(w_last[..., : bio.NUM_OCEAN_BIOMES] > F32(0.0), axis=-1, keepdims=True)
    in_cave, bottom_d, top_d = _cave_depths(
        cave_starts[..., None, :], cave_ends[..., None, :], wy[..., None]
    )
    above_ground = wyf > hf
    is_top = wyf >= hf - F32(1.0)

    n_fwd = bio.NUM_FORWARD_MATERIALS
    layer_starts = jnp.moveaxis(layers, 1, -1)
    lsx = layer_starts[..., None, :]
    yq = wyf[..., None]
    layer_ends = jnp.concatenate([layer_starts[..., 1:], hf], axis=-1)[..., None, :]
    in_layer = (lsx <= yq) & (yq < layer_ends)
    fwd_ok = wyf < layer_starts[..., n_fwd][..., None]
    lane = jnp.arange(bio.NUM_MATERIALS, dtype=I32)
    in_layer = in_layer & ((lane >= n_fwd) | fwd_ok[..., None])
    layer_idx = jnp.argmax(in_layer, axis=-1)
    body = jnp.asarray(bio.MATERIAL_BLOCK, I32)[layer_idx].astype(U8)
    grass = jnp.asarray(bio.GRASS_BLOCKS, I32)[rand_biome].astype(U8)
    body = jnp.where((body == _u8(_B.DIRT)) & is_top, grass, body)

    if mode == "body_only":
        return body

    pre_hit = _biome_preprocess_hit(rand_biome, wxf, wyf, wzf, hf)
    body = jnp.where(pre_hit, _u8(_B.QUARTZ), body)
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
    if mode == "cascade":
        return block

    post_mask = (solid_mask | water_mask) & ~cave_mask
    post = _biome_postprocess(block, rand_biome, wxf, wyf, wzf, is_top)
    block = jnp.where(post_mask, post, block)
    if mode == "no_cavebiome":
        return block

    yb = CAVE_BIOME_Y_MAX
    zero_b = zero_y[..., :yb]
    cave_biome_band = get_cave_biome(
        wx[..., None] + zero_b, wy[..., :yb], wz[..., None] + zero_b, hf, SEED_FILL_CAVE_BIOME
    )
    cave_post_band = _cave_biome_postprocess(
        block[..., :yb], cave_biome_band, wxf, wyf[..., :yb], wzf,
        bottom_d[..., :yb], top_d[..., :yb],
    )
    block_band = jnp.where((solid_mask & ~pre_hit)[..., :yb], cave_post_band, block[..., :yb])
    return jnp.concatenate([block_band, block[..., yb:]], axis=-1)


def timeit(name, f, reps=5):
    t0 = time.time()
    out = f()
    np.asarray(out.ravel()[:1])
    print(f"{name:22s} compile+run {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = f()
    np.asarray(out.ravel()[:1])
    print(f"{name:22s} {(time.time()-t0)/reps*1e3:9.1f} ms", flush=True)


for mode in ("randbiome_only", "body_only", "cascade", "no_cavebiome", "full"):
    timeit(mode, lambda m=mode: fill_ablate(*args, mode=m))

timeit("fill_chunks (current)", lambda: fill_mod.fill_chunks(*args))
