"""Stage 6: decorators — 1-2-block flora/crystals placed after fill.

TPU-native equivalent of the reference's CPU decorator pass (reference behavior:
/root/reference/src/terrain/chunk.cu:1634-1747 ``placeDecorators`` /
``tryPlaceSingleDecorator``): per column, one weighted surface decorator plus per
cave layer floor/ceiling decorators; checks the under-block whitelist, replaceable
block (air/water), and an optional second block for tall plants.

Design: the chunk's single sequential minstd engine makes columns *draw*-dependent but
*write*-independent (all writes stay within their own column) — so the draw sequence
runs as a ``lax.scan`` over the 256 columns (bit-exact masked LCG steps), and the
placements then apply as vectorized masked scatters in the reference's write order.
The reference's never-set placedBottom/placedTop flags (chunk.cu:1718-1719, an
upstream quirk where later gens keep overwriting) are reproduced as-is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hashes
from ..world import biomes as bio
from ..world import features_data as fd
from ..world.blocks import NUM_NON_SOLID_BLOCKS, Block
from .fill import random_biome

F32 = jnp.float32
I32 = jnp.int32
U8 = jnp.uint8

SEED_DECORATORS = 7589341  # chunk.cu:1681
MAX_LAYERS = bio.MAX_CAVE_LAYERS_PER_COLUMN
#: a^k mod m for every reachable stream position: 256 columns × ≤(2 + 2·32)
#: draws = 16896, +4 slack for the peek/+1 offsets
_LCG_POW = hashes.lcg_pow_table(16900)
#: cave layers that can actually receive decorators (draws still cover all 32;
#: columns with more than this many cave layers are astronomically rare)
MAX_APPLY_LAYERS = 8


def _gen_lists(table: dict, n_biomes: int):
    max_gens = max((len(v) for v in table.values()), default=1) or 1
    out = []
    for b in range(n_biomes):
        gens = table.get(b, [])
        out.append(gens)
    return out, max_gens


@jax.jit
def place_decorators(blocks, heightfield, biome_weights, cave_starts, cave_ends,
                     cave_bottom_biome, chunk_pos1):
    """Apply decorators to ONE chunk.

    Args:
      blocks [16,16,384] u8, heightfield [16,16] f32, biome_weights [24,16,16] f32,
      cave_starts/ends [16,16,32] i32, cave_bottom_biome [16,16,32] i32,
      chunk_pos1 [2] i32.
    """
    # ---- phase 1: the draw stream (column-major z, x — chunk.cu:1684) ----
    # The reference consumes ONE sequential minstd stream per chunk, but each
    # column's draw COUNT (2 + 2·drawing-layers) is known without sequencing, so
    # every consumed draw's global stream position is a prefix sum — and a
    # minstd stream is jumpable in closed form (state_j = a^j·s0 mod 2³¹−1).
    # All draws evaluate in parallel via one power-table gather + mulmod each,
    # replacing a 256-step sequential scan (the old decorator hot spot).
    # Draws the reference makes but never consumes (the per-layer peek values of
    # non-drawing layers) are left as garbage; every consumer below masks them
    # with ``draws_layer``.
    w_last = jnp.moveaxis(biome_weights, 0, -1).reshape(256, 24)
    starts = cave_starts.reshape(256, MAX_LAYERS)
    valid_layers = starts != I32(384)
    # the reference's loop breaks at the first start==384 slot; layers after a
    # sentinel never draw
    seen_end = jnp.cumsum((starts == I32(384)).astype(I32), axis=-1) > 0
    draws_layer = valid_layers & ~seen_end

    state0 = hashes.seed_4(chunk_pos1[0], 0, chunk_pos1[1], SEED_DECORATORS)

    k_col = I32(2) + I32(2) * draws_layer.sum(-1).astype(I32)  # [256]
    col_base = jnp.cumsum(k_col) - k_col  # exclusive prefix: stream pos of draw 0
    drawn_before = jnp.cumsum(draws_layer.astype(I32), -1) - draws_layer  # [256,32]
    pos_bottom = col_base[:, None] + I32(2) + I32(2) * drawn_before
    ptab = jnp.asarray(_LCG_POW)
    r_biome = hashes.lcg_value_at(state0, col_base, ptab)
    r_surface = hashes.lcg_value_at(state0, col_base + I32(1), ptab)
    r_bottom = hashes.lcg_value_at(state0, pos_bottom, ptab)
    r_top = hashes.lcg_value_at(state0, pos_bottom + I32(1), ptab)
    # r_biome/r_surface: [256]; r_bottom/r_top: [256, 32]

    biome = random_biome(w_last, r_biome)  # [256]

    # ---- phase 2: vectorized application ----
    # Per-column reads/writes run as ONE-HOT selects over the y axis of a
    # [256, 384] view (384 minor = 3×128 full VPU lanes): a read is a masked max,
    # a write a masked select — each a single fused elementwise pass.  The naive
    # formulation (advanced-index gathers + ``.at[].set`` scatters, 163 sequential
    # try_place calls) spent ~286 ms per 25-chunk batch in XLA:TPU scatters; the
    # select form is pure HBM-bandwidth (~5 passes × 2.4 MB per call).
    blocks = blocks.reshape(256, 384)  # row c = column (z = c//16, x = c%16)
    yidx = jnp.arange(384, dtype=I32)[None, :]

    ground_y = heightfield.reshape(256).astype(I32) + I32(1)
    non_solid = I32(NUM_NON_SOLID_BLOCKS)

    def hot_of(y):
        return yidx == jnp.clip(y, 0, 383)[:, None]  # [256, 384]

    def read(blocks, hot):
        return jnp.max(jnp.where(hot, blocks, U8(0)), axis=-1)

    def try_place(blocks, active, y, gen):
        (dec_block, _ch, under, replace, second, ceiling) = gen
        y = jnp.asarray(y, I32)
        hot_y = hot_of(y)
        cur = read(blocks, hot_y)
        ok = active & (y >= 0) & (y <= 383)
        # possibleReplaceBlocks check (empty set never occurs in the tables)
        rep_ok = jnp.zeros_like(ok)
        for rb in replace:
            rep_ok = rep_ok | (cur == U8(rb))
        ok = ok & rep_ok
        u_off = 1 if ceiling else -1
        uy = y + u_off
        ok = ok & (uy >= 0) & (uy <= 383)
        ub = read(blocks, hot_of(uy))
        ok = ok & (ub.astype(I32) >= non_solid)
        if under:
            u_ok = jnp.zeros_like(ok)
            for b in under:
                u_ok = u_ok | (ub == U8(b))
            ok = ok & u_ok
        if second != int(Block.AIR):
            oy = y - u_off
            ok = ok & (oy >= 0) & (oy <= 383)
            hot_o = hot_of(oy)
            ob = read(blocks, hot_o)
            o_ok = jnp.zeros_like(ok)
            for rb in replace:
                o_ok = o_ok | (ob == U8(rb))
            ok = ok & o_ok
            blocks = jnp.where(hot_o & ok[:, None], U8(second), blocks)
        blocks = jnp.where(hot_y & ok[:, None], U8(dec_block), blocks)
        return blocks

    # surface decorators: first gen whose cumulative chance crosses the draw
    surf_lists, _ = _gen_lists(fd.BIOME_DECORATOR_GENS, bio.NUM_BIOMES)
    for b, gens in enumerate(surf_lists):
        if not gens:
            continue
        is_b = biome == I32(b)
        rand = r_surface
        chosen_before = jnp.zeros_like(is_b)
        running = jnp.zeros_like(rand)
        for gen in gens:
            running = running + F32(gen[1])
            choose = is_b & ~chosen_before & (rand < running)
            blocks = try_place(blocks, choose, ground_y, gen)
            chosen_before = chosen_before | choose

    # cave decorators per layer: the reference's cumulative-crossing with never-set
    # placed flags means every gen past the crossing point also places
    cave_lists, _ = _gen_lists(fd.CAVE_DECORATOR_GENS, bio.NUM_CAVE_BIOMES)
    starts_c = starts
    ends_c = cave_ends.reshape(256, MAX_LAYERS)
    cbb = cave_bottom_biome.reshape(256, MAX_LAYERS)
    for li in range(MAX_APPLY_LAYERS):
        layer_ok = draws_layer[:, li]
        floor_y = starts_c[:, li] + I32(1)
        ceil_y = ends_c[:, li]
        for b, gens in enumerate(cave_lists):
            if not gens:
                continue
            is_b = layer_ok & (cbb[:, li] == I32(b))
            run_b = jnp.zeros((256,), F32)
            run_t = jnp.zeros((256,), F32)
            for gen in gens:
                ceiling = gen[5]
                if ceiling:
                    run_t = run_t + F32(gen[1])
                    choose = is_b & (r_top[:, li] < run_t)
                    blocks = try_place(blocks, choose, ceil_y, gen)
                else:
                    run_b = run_b + F32(gen[1])
                    choose = is_b & (r_bottom[:, li] < run_b)
                    blocks = try_place(blocks, choose, floor_y, gen)

    return blocks.reshape(16, 16, 384)


@jax.jit
def place_decorators_batch(blocks, heightfield, biome_weights, cave_starts, cave_ends,
                           cave_bottom_biome, chunk_pos):
    """Batched ``place_decorators`` via ``vmap``: unlike the SDF feature pass there
    is no ``lax.switch`` to blow up, so all chunks' column scans and masked scatters
    run as ONE parallel program instead of ``lax.map``'s serialized per-chunk loop."""
    return jax.vmap(place_decorators)(
        blocks, heightfield, biome_weights, cave_starts, cave_ends,
        cave_bottom_biome, chunk_pos,
    )
