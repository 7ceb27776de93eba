"""Stage 3: zone erosion — Machado (2019) "slope method", fully on-device.

TPU-native equivalent of the reference's erosion kernel + host relaxation loop
(reference behavior: /root/reference/src/terrain/chunk.cu:473-723 ``kernDoErosion`` /
``Chunk::erodeZone``): a 24×24-chunk zone (384×384 columns) of 8 eroded-layer start
heights is relaxed top layer first; each iteration raises ``layerStart`` to
``max(neighborStart − tanAngleOfRepose·dist)`` (clamped to the layer end) until a
did-change flag stays false, accumulating per-column height offsets applied to the
layers below.

Design: the reference round-trips a did-change flag to the host after EVERY kernel
launch (chunk.cu:687-704) — here the whole relaxation is one ``lax.while_loop`` per
layer with an on-device convergence flag, so the entire zone erosion is a single XLA
executable with zero host synchronization.  The 8-direction neighbor reads are static
jnp.pad + slice shifts (pure VPU stencil, Jacobi iteration — same least fixpoint as
the reference's chaotic per-block relaxation since the update operator is monotone).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..world import biomes as bio

F32 = jnp.float32
SQRT_2 = F32(1.41421356237309504880)

ZONE_SIZE = 12  # chunks per zone side (terrain.hpp:17)
GRID_CHUNKS = ZONE_SIZE * 2  # 24×24-chunk gathered grid incl. 6-chunk padding
GRID_BLOCKS = GRID_CHUNKS * 16  # 384
CORE_LO = (ZONE_SIZE // 2) * 16  # 96 — core (written-back) region start
CORE_HI = CORE_LO + ZONE_SIZE * 16  # 288


def _shift_edge_clamp(a, dx, dz):
    """a[..., z, x] shifted by (dx, dz) with edge-replicate halo (chunk.cu:545)."""
    p = jnp.pad(a, ((1, 1), (1, 1)), mode="edge")
    return p[1 + dz : 1 + dz + GRID_BLOCKS, 1 + dx : 1 + dx + GRID_BLOCKS]


def _relax_once(start, end, tan_repose):
    """One Jacobi relaxation step.  Returns (new_start, wrote_mask, changed_any)."""
    new_start = start
    max_thickness = end - start
    for i, (dx, dz) in enumerate(bio.DIR_VECS_2D):
        nb_start = _shift_edge_clamp(start, int(dx), int(dz))
        nb_end = _shift_edge_clamp(end, int(dx), int(dz))
        dist = SQRT_2 if i % 2 == 1 else F32(1.0)
        new_start = jnp.maximum(new_start, nb_start - tan_repose * dist)
        max_thickness = jnp.maximum(max_thickness, nb_end - nb_start)
    new_start = jnp.minimum(new_start, end)
    wrote = max_thickness > F32(0.0)
    changed = jnp.logical_and(wrote, new_start != start)
    return jnp.where(wrote, new_start, start), changed


@jax.jit
def erode_zone(gathered_layers):
    """Erode one gathered zone entirely on-device.

    Args:
      gathered_layers: [9, 384, 384] f32 — slots 0..7 are eroded-layer start heights
        (materials GRAVEL..SNOW), slot 8 is the heightfield (top boundary).

    Returns:
      eroded [9, 384, 384] f32 (slot 8 unchanged), matching the reference's
      gatheredLayers after the full relaxation (including its accumulated-height
      application to successive layers, chunk.cu:507-555,585).
    """
    g = gathered_layers
    accum = jnp.zeros((GRID_BLOCKS, GRID_BLOCKS), F32)
    n_eroded = bio.NUM_ERODED_MATERIALS  # 8

    for rel in range(n_eroded - 1, -1, -1):
        mat = bio.NUM_STRATIFIED_MATERIALS + rel
        tan_repose = F32(float(bio.MATERIAL_AMPLITUDE_OR_TAN_REPOSE[mat]))

        # first iteration: reads include the per-column accumulated offsets
        start = g[rel] + accum
        end = g[rel + 1] + accum
        new_start, changed = _relax_once(start, end, tan_repose)
        accum = accum + jnp.where(changed, new_start - start, F32(0.0))
        # write rule (chunk.cu:576-587): columns with any positive neighborhood
        # thickness get the absolute (accum-included) value; others keep raw
        layer = jnp.where(_wrote_mask(start, end), new_start, g[rel])

        # subsequent iterations: raw reads, no accum (reference isFirst=false)
        def body(state):
            layer, end_raw, accum, _ = state
            s = layer
            e = end_raw
            ns, ch = _relax_once(s, e, tan_repose)
            accum = accum + jnp.where(ch, ns - s, F32(0.0))
            layer = jnp.where(_wrote_mask(s, e), ns, layer)
            return layer, end_raw, accum, jnp.any(ch)

        def cond(state):
            return state[3]

        layer, _, accum, _ = jax.lax.while_loop(
            cond, body, (layer, g[rel + 1], accum, jnp.any(changed))
        )
        g = g.at[rel].set(layer)

    return g


def _wrote_mask(start, end):
    """maxThickness > 0 mask: the reference writes the start value back whenever the
    local 3×3 neighborhood has any positive layer thickness (chunk.cu:560-578)."""
    max_thickness = end - start
    for i, (dx, dz) in enumerate(bio.DIR_VECS_2D):
        nb_start = _shift_edge_clamp(start, int(dx), int(dz))
        nb_end = _shift_edge_clamp(end, int(dx), int(dz))
        max_thickness = jnp.maximum(max_thickness, nb_end - nb_start)
    return max_thickness > F32(0.0)


def gather_zone_layers(layers_grid, heightfield_grid):
    """Assemble the [9, 384, 384] gathered-layer grid from per-chunk arrays.

    Args:
      layers_grid: [24, 24, 20, 16, 16] f32 per-chunk layers ([cz, cx, l, z, x]).
      heightfield_grid: [24, 24, 16, 16] f32.
    """
    n_strat = bio.NUM_STRATIFIED_MATERIALS
    eroded = layers_grid[:, :, n_strat:]  # [24, 24, 8, 16, 16]
    eroded = jnp.transpose(eroded, (2, 0, 3, 1, 4)).reshape(
        bio.NUM_ERODED_MATERIALS, GRID_BLOCKS, GRID_BLOCKS
    )
    hf = jnp.transpose(heightfield_grid, (0, 2, 1, 3)).reshape(
        1, GRID_BLOCKS, GRID_BLOCKS
    )
    return jnp.concatenate([eroded, hf], axis=0)


def scatter_zone_layers(layers_grid_core, eroded):
    """Write eroded starts back into the core 12×12 chunks' layer arrays.

    Args:
      layers_grid_core: [12, 12, 20, 16, 16] f32 core-chunk layers.
      eroded: [9, 384, 384] output of erode_zone.

    Returns updated [12, 12, 20, 16, 16].
    """
    n_strat = bio.NUM_STRATIFIED_MATERIALS
    core = eroded[: bio.NUM_ERODED_MATERIALS, CORE_LO:CORE_HI, CORE_LO:CORE_HI]
    core = core.reshape(bio.NUM_ERODED_MATERIALS, ZONE_SIZE, 16, ZONE_SIZE, 16)
    core = jnp.transpose(core, (1, 3, 0, 2, 4))  # [cz, cx, l, z, x]
    return layers_grid_core.at[:, :, n_strat:].set(core)
