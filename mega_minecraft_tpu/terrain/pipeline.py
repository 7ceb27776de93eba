"""Pipeline orchestration: compose the generation stages over chunk areas.

The array-world equivalent of the reference's per-stage batching in Terrain::tick
(reference behavior: /root/reference/src/terrain/terrain.cpp:587-960 — every stage
call batches all ready chunks into one launch).  Here a "batch" is a leading array
dimension; the streaming scheduler (scheduler.py) assembles batches per frame, while
``generate_area`` below generates a static rectangular area in one go (used by the
static-scene benchmarks and the demo).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import caves as caves_mod
from . import erosion, fill, heightfield, layers

I32 = np.int32


from functools import partial

import jax


def generate_area_fused(pos_halo, ncx: int, ncz: int, features: bool = False):
    """The full per-chunk pipeline (heightfield → layers → caves → fill, and with
    ``features=True`` also feature placement → 49-chunk gather → SDF feature fill →
    decorators) for an ``ncx × ncz`` area as TWO chained jitted device programs —
    no host round-trips between stages (the second dispatch consumes the first's
    device-resident outputs asynchronously).  Split rather than one monolithic
    jit: XLA compile time is superlinear in module size (the one-program form
    took >25 min to compile after the round-4 batched feature apply, past
    bench.py's generation-leg deadline; the halves bound the worst compile AND
    cache independently — an SDF edit no longer recompiles the terrain half).
    (Erosion is a separate zone-grid pass; see erosion.erode_zone.)

    Args:
      pos_halo: [(ncz+2)*(ncx+2), 2] i32 world-block chunk origins, row-major with
        the 1-chunk halo included.
    Returns dict of device arrays for the ncx*ncz inner chunks.
    """
    out = _fused_gen_half(pos_halo, ncx, ncz)
    if features:
        out = dict(out)
        out["blocks"] = _fused_feature_half(
            out["blocks"], out["heightfield"], out["biome_weights"], out["layers"],
            out["caves"], out["chunk_pos"], ncx, ncz,
        )
    return out


@partial(jax.jit, static_argnames=("ncx", "ncz"))
def _fused_gen_half(pos_halo, ncx: int, ncz: int):
    hz, hx = ncz + 2, ncx + 2
    hf, w = heightfield.generate_heightfield(pos_halo)
    hf_grid = hf.reshape(hz, hx, 16, 16)
    full = jnp.transpose(hf_grid, (0, 2, 1, 3)).reshape(hz * 16, hx * 16)
    gathered = jnp.stack(
        [
            full[(iz + 1) * 16 - 1 : (iz + 1) * 16 + 17, (ix + 1) * 16 - 1 : (ix + 1) * 16 + 17]
            for iz in range(ncz)
            for ix in range(ncx)
        ]
    )
    inner = jnp.asarray(
        np.array([(iz + 1) * hx + ix + 1 for iz in range(ncz) for ix in range(ncx)], I32)
    )
    w_in = w[inner]
    hf_in = hf[inner]
    pos_in = pos_halo[inner]
    ls = layers.generate_layers(gathered, w_in, pos_in)
    ls = layers.fix_backward_stratified(ls)
    cv = caves_mod.generate_caves(hf_in, w_in, pos_in)
    blocks = fill.fill_chunks(hf_in, w_in, ls, cv["starts"], cv["ends"], pos_in)
    return {
        "blocks": blocks,
        "heightfield": hf_in,
        "biome_weights": w_in,
        "layers": ls,
        "caves": cv,
        "chunk_pos": pos_in,
    }


@partial(jax.jit, static_argnames=("ncx", "ncz"))
def _fused_feature_half(blocks, hf_in, w_in, ls, cv, pos_in, ncx: int, ncz: int):
    from . import decorators as decorators_mod
    from . import feature_placement as fp
    from . import features as features_mod

    pl = fp.generate_placements(
        hf_in, w_in, ls, cv["starts"], cv["ends"],
        cv["bottom_biome"], cv["top_biome"], pos_in,
    )
    lists = fp.compact_placements(pl, pos_in)
    # area-level application: every source placement evaluates ONCE over the
    # whole area with exact spiral-gather priority (features.py) — replaces
    # the per-chunk 49-gather + per-chunk loops (each source re-evaluated in
    # up to 49 consumer chunks); area borders clip identically (rank ∞)
    blocks = features_mod.apply_features_area(
        blocks, lists["surface"], lists["cave"], pos_in, ncx, ncz
    )
    return decorators_mod.place_decorators_batch(
        blocks, hf_in, w_in, cv["starts"], cv["ends"], cv["bottom_biome"], pos_in
    )


def _chunk_positions(cx0: int, cz0: int, ncx: int, ncz: int) -> np.ndarray:
    pos = np.empty((ncz, ncx, 2), I32)
    for iz in range(ncz):
        for ix in range(ncx):
            pos[iz, ix] = ((cx0 + ix) * 16, (cz0 + iz) * 16)
    return pos.reshape(-1, 2)


def generate_area(
    cx0: int,
    cz0: int,
    ncx: int,
    ncz: int,
    erode: bool = False,
    fill_batch: int = 16,
    features: bool = False,
):
    """Generate a ``ncx × ncz``-chunk area (chunk coords origin (cx0, cz0)).

    Runs heightfield (with a 1-chunk halo), layers, optional zone erosion (only when
    the area is a full 24×24 zone grid), caves and fill.  Feature placement composes
    separately (terrain.features).

    Returns dict with 'blocks' [ncz, ncx, 16, 16, 384] u8 and intermediates.
    """
    # 1. heightfield over area + halo
    hx, hz = ncx + 2, ncz + 2
    pos_h = jnp.asarray(_chunk_positions(cx0 - 1, cz0 - 1, hx, hz))
    hf, weights = heightfield.generate_heightfield(pos_h)
    hf_grid = np.asarray(hf).reshape(hz, hx, 16, 16)
    w_grid = np.asarray(weights).reshape(hz, hx, 24, 16, 16)

    # 2. gather 18×18 heightfields for inner chunks
    full = hf_grid.transpose(0, 2, 1, 3).reshape(hz * 16, hx * 16)
    gathered = np.empty((ncz * ncx, 18, 18), np.float32)
    for iz in range(ncz):
        for ix in range(ncx):
            z0 = (iz + 1) * 16 - 1
            x0 = (ix + 1) * 16 - 1
            gathered[iz * ncx + ix] = full[z0 : z0 + 18, x0 : x0 + 18]

    pos_in = jnp.asarray(_chunk_positions(cx0, cz0, ncx, ncz))
    w_in = jnp.asarray(
        w_grid[1 : 1 + ncz, 1 : 1 + ncx].reshape(ncz * ncx, 24, 16, 16)
    )
    hf_in = jnp.asarray(
        hf_grid[1 : 1 + ncz, 1 : 1 + ncx].reshape(ncz * ncx, 16, 16)
    )

    # 3. layers
    ls = layers.generate_layers(jnp.asarray(gathered), w_in, pos_in)

    # 4. optional zone erosion (full 24×24 grid only)
    if erode:
        if (ncx, ncz) != (erosion.GRID_CHUNKS, erosion.GRID_CHUNKS):
            raise ValueError("erode=True requires a 24x24-chunk area (one full zone grid)")
        lg = np.asarray(ls).reshape(ncz, ncx, 20, 16, 16)
        g = erosion.gather_zone_layers(jnp.asarray(lg), jnp.asarray(hf_grid[1:-1, 1:-1]))
        eroded = erosion.erode_zone(g)
        core = jnp.asarray(lg[6:18, 6:18])
        updated = erosion.scatter_zone_layers(core, eroded)
        lg[6:18, 6:18] = np.asarray(updated)
        ls = jnp.asarray(lg.reshape(ncz * ncx, 20, 16, 16))

    ls = layers.fix_backward_stratified(ls)

    # 5. caves
    cv = caves_mod.generate_caves(hf_in, w_in, pos_in)

    # 5b. feature placements (features within the area; the halo's placements are
    # not generated here, so features near the area border may be missing — the
    # streaming scheduler does the full 49-chunk gather)
    if features:
        from . import feature_placement as fp

        pl = fp.generate_placements(
            hf_in, w_in, ls, cv["starts"], cv["ends"],
            cv["bottom_biome"], cv["top_biome"], pos_in,
        )
        placement_lists = fp.compact_placements(pl, pos_in)

    # 6. fill, in batches to bound peak memory
    n = ncz * ncx
    blocks_np = np.empty((n, 16, 16, 384), np.uint8)
    for b0 in range(0, n, fill_batch):
        b1 = min(b0 + fill_batch, n)
        # pad the final slice to the full batch size so only one program is compiled
        pad = fill_batch - (b1 - b0)
        sl = lambda a: jnp.concatenate([a[b0:b1], a[b1 - pad : b1]], 0) if pad else a[b0:b1]
        out = np.asarray(
            fill.fill_chunks(
                sl(hf_in), sl(w_in), sl(ls), sl(cv["starts"]), sl(cv["ends"]), sl(pos_in)
            )
        )
        blocks_np[b0:b1] = out[: b1 - b0]

    # 6b. features + decorators, batched over all chunks (3 device dispatches)
    if features:
        from . import decorators as decorators_mod
        from . import feature_placement as fp
        from . import features as features_mod

        # area-level application (see generate_area_fused): one evaluation per
        # source placement over the whole area, exact spiral-gather priority
        b = features_mod.apply_features_area(
            jnp.asarray(blocks_np), placement_lists["surface"],
            placement_lists["cave"], pos_in, ncx, ncz,
        )
        b = decorators_mod.place_decorators_batch(
            b, hf_in, w_in, cv["starts"], cv["ends"], cv["bottom_biome"], pos_in
        )
        blocks_np = np.asarray(b)

    out = {
        "blocks": blocks_np.reshape(ncz, ncx, 16, 16, 384),
        "heightfield": hf_in,
        "biome_weights": w_in,
        "layers": ls,
        "caves": cv,
        "chunk_pos": pos_in,
    }
    if features:
        out["placements"] = placement_lists
    return out
