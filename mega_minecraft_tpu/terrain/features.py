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
