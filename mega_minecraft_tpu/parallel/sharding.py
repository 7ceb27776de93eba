"""Multi-chip sharding: device mesh, data-parallel generation, halo-exchanged erosion.

The reference is single-GPU with no distributed layer (SURVEY.md §2 parallelism
accounting); this module is the TPU-native scale-out it never had:

- **Chunk batches are data-parallel**: generation stages are pure functions of world
  coordinates, so heightfield/layers/caves/fill shard over the batch axis with zero
  communication — each chunk's 18×18 heightfield halo is *recomputed* from noise
  rather than exchanged (compute is cheaper than ICI for 1-block halos).
- **Zone erosion is spatially sharded**: the 384×384-column relaxation shards by rows
  with a 1-row halo exchanged per Jacobi iteration via ``lax.ppermute`` over ICI, and
  the convergence flag is a ``psum`` — the whole variable-iteration loop stays on
  device across all chips (the reference round-trips a flag to the host per iteration,
  chunk.cu:687-704).
- **Rendering shards by image rows**: rays are independent; the scene volume is
  replicated (reads only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..terrain import erosion, fill, heightfield, layers
from ..world import biomes as bio

F32 = jnp.float32


def make_mesh(
    n_devices: int | None = None, axis: str = "d", platform: str | None = None
) -> Mesh:
    """Build a 1-D mesh over ``platform`` devices (default: the default backend).
    ``platform='cpu'`` selects the virtual host devices used for sharding tests even
    when a TPU is the default backend."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _mesh_platform(mesh: Mesh) -> str:
    return mesh.devices.flat[0].platform


# ---------------------------------------------------------------------------
# Data-parallel generation: batch axis sharded, no collectives needed.
# ---------------------------------------------------------------------------


def _gen_stage_layers(chunk_pos, height_fns=None):
    """Heightfield (+halo recompute from noise) and layers for a chunk batch.
    chunk_pos [B, 2] world-block coords → (hf [B,16,16], weights [B,24,16,16],
    layers [B,20,16,16])."""
    lx = jnp.arange(-1, 17, dtype=jnp.int32)
    wx = (chunk_pos[:, 0, None, None] + lx[None, None, :]).astype(F32)
    wz = (chunk_pos[:, 1, None, None] + lx[None, :, None]).astype(F32)
    noise6 = heightfield.biome_noise(wx, wz)
    weights18 = heightfield.biome_weights_from_noise(noise6)  # [B, 18, 18, 24]
    h18 = jnp.zeros(wx.shape, F32)
    for biome, fn in (height_fns or heightfield.HEIGHT_FNS).items():
        w = weights18[..., int(biome)]
        h18 = h18 + jnp.where(w > F32(0.0), w * fn(wx, wz), F32(0.0))

    hf = h18[:, 1:17, 1:17]
    weights = jnp.moveaxis(weights18[:, 1:17, 1:17], -1, 1)  # [B, 24, 16, 16]
    ls = layers.generate_layers(h18, weights, chunk_pos)
    ls = layers.fix_backward_stratified(ls)
    return hf, weights, ls


def _gen_stage_fill(hf, weights, ls, chunk_pos):
    B = chunk_pos.shape[0]
    # The empty cave set must not be a compile-time constant: XLA:CPU's constant
    # folding otherwise evaluates the whole cave-carve expression tree at compile
    # time (minutes-to-hours of folding for a seconds-long program).
    empty_caves = jax.lax.optimization_barrier(
        jnp.full((B, 16, 16, 32), 384, jnp.int32)
    )
    return fill.fill_chunks(hf, weights, ls, empty_caves, empty_caves, chunk_pos)


def _gen_chunk_batch(chunk_pos, height_fns=None):
    """Self-contained per-chunk generation: heightfield (+halo recompute), layers,
    fill with empty cave set.  chunk_pos [B, 2] world-block coords."""
    return _gen_stage_fill(*_gen_stage_layers(chunk_pos, height_fns), chunk_pos)


def dp_generate(mesh: Mesh, chunk_pos, height_fns=None, staged: bool | None = None):
    """Generate a chunk batch sharded over the mesh's devices (batch axis).

    ``staged=True`` compiles the layers and fill stages as separate XLA programs
    (sharded intermediates stay on device); ``staged=None`` auto-selects staged on
    CPU meshes, where whole-pipeline modules hit a pathological compile-time
    blowup in XLA:CPU (hours vs seconds — observed on jax 0.8; TPU is unaffected).
    """
    if staged is None:
        staged = _mesh_platform(mesh) == "cpu"
    spec = NamedSharding(mesh, P(mesh.axis_names[0]))
    pos = jax.device_put(chunk_pos, spec)
    if not staged:
        f = jax.jit(
            partial(_gen_chunk_batch, height_fns=height_fns),
            in_shardings=spec,
            out_shardings=spec,
        )
        return f(pos)
    hf, weights, ls = jax.jit(partial(_gen_stage_layers, height_fns=height_fns))(pos)
    return jax.jit(_gen_stage_fill)(hf, weights, ls, pos)


# ---------------------------------------------------------------------------
# Spatially-sharded zone erosion with ICI halo exchange.
# ---------------------------------------------------------------------------


def _relax_sharded(start, end, tan_repose, axis: str, n: int):
    """One Jacobi step on a row-sharded [rows_local, 384] grid with ppermute halos."""
    idx = jax.lax.axis_index(axis)
    send_down = [(i, (i + 1) % n) for i in range(n)]  # my last row -> next shard's top halo
    send_up = [(i, (i - 1) % n) for i in range(n)]  # my first row -> prev shard's bottom halo

    def with_halo(a):
        top = jax.lax.ppermute(a[-1:], axis, send_down)
        bot = jax.lax.ppermute(a[:1], axis, send_up)
        # edge shards replicate their own border (reference clamps, chunk.cu:545)
        top = jnp.where(idx == 0, a[:1], top)
        bot = jnp.where(idx == n - 1, a[-1:], bot)
        return jnp.concatenate([top, a, bot], axis=0)

    sh = with_halo(start)
    eh = with_halo(end)
    rows = start.shape[0]
    new_start = start
    max_th = end - start
    for i, (dx, dz) in enumerate(bio.DIR_VECS_2D):
        nb_s = jnp.pad(sh, ((0, 0), (1, 1)), mode="edge")[
            1 + dz : 1 + dz + rows, 1 + dx : 1 + dx + 384
        ]
        nb_e = jnp.pad(eh, ((0, 0), (1, 1)), mode="edge")[
            1 + dz : 1 + dz + rows, 1 + dx : 1 + dx + 384
        ]
        dist = erosion.SQRT_2 if i % 2 == 1 else F32(1.0)
        new_start = jnp.maximum(new_start, nb_s - tan_repose * dist)
        max_th = jnp.maximum(max_th, nb_e - nb_s)
    new_start = jnp.minimum(new_start, end)
    wrote = max_th > F32(0.0)
    changed = wrote & (new_start != start)
    return jnp.where(wrote, new_start, start), changed


def erode_zone_sharded(mesh: Mesh, gathered_layers):
    """Row-sharded erode_zone: [9, 384, 384] with rows split over the mesh axis.

    Per eroded layer, runs the Jacobi relaxation as a lax.while_loop whose
    convergence flag is a cross-chip psum — zero host synchronization.
    """
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]

    def shard_fn(g):
        # g: [9, rows_local, 384]
        accum = jnp.zeros(g.shape[1:], F32)
        for rel in range(bio.NUM_ERODED_MATERIALS - 1, -1, -1):
            mat = bio.NUM_STRATIFIED_MATERIALS + rel
            tan_repose = F32(float(bio.MATERIAL_AMPLITUDE_OR_TAN_REPOSE[mat]))
            start = g[rel] + accum
            end = g[rel + 1] + accum
            new_start, changed = _relax_sharded(start, end, tan_repose, axis, n_shards)
            accum = accum + jnp.where(changed, new_start - start, F32(0.0))
            layer = jnp.where(_wrote_mask_sharded(start, end, axis, n_shards), new_start, g[rel])

            def body(state):
                layer, accum, _ = state
                ns, ch = _relax_sharded(layer, g[rel + 1], tan_repose, axis, n_shards)
                accum = accum + jnp.where(ch, ns - layer, F32(0.0))
                layer2 = jnp.where(_wrote_mask_sharded(layer, g[rel + 1], axis, n_shards), ns, layer)
                any_changed = jax.lax.psum(jnp.any(ch).astype(jnp.int32), axis) > 0
                return layer2, accum, any_changed

            def cond(state):
                return state[2]

            init_changed = jax.lax.psum(jnp.any(changed).astype(jnp.int32), axis) > 0
            layer, accum, _ = jax.lax.while_loop(cond, body, (layer, accum, init_changed))
            g = g.at[rel].set(layer)
        return g

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )
    return jax.jit(f)(gathered_layers)


def _wrote_mask_sharded(start, end, axis: str, n: int):
    idx = jax.lax.axis_index(axis)
    send_down = [(i, (i + 1) % n) for i in range(n)]
    send_up = [(i, (i - 1) % n) for i in range(n)]
    top = jax.lax.ppermute(start[-1:], axis, send_down)
    bot = jax.lax.ppermute(start[:1], axis, send_up)
    top = jnp.where(idx == 0, start[:1], top)
    bot = jnp.where(idx == n - 1, start[-1:], bot)
    sh = jnp.concatenate([top, start, bot], axis=0)
    tope = jax.lax.ppermute(end[-1:], axis, send_down)
    bote = jax.lax.ppermute(end[:1], axis, send_up)
    tope = jnp.where(idx == 0, end[:1], tope)
    bote = jnp.where(idx == n - 1, end[-1:], bote)
    eh = jnp.concatenate([tope, end, bote], axis=0)
    rows = start.shape[0]
    max_th = end - start
    for i, (dx, dz) in enumerate(bio.DIR_VECS_2D):
        nb_s = jnp.pad(sh, ((0, 0), (1, 1)), mode="edge")[1 + dz : 1 + dz + rows, 1 + dx : 1 + dx + 384]
        nb_e = jnp.pad(eh, ((0, 0), (1, 1)), mode="edge")[1 + dz : 1 + dz + rows, 1 + dx : 1 + dx + 384]
        max_th = jnp.maximum(max_th, nb_e - nb_s)
    return max_th > F32(0.0)


# ---------------------------------------------------------------------------
# Image-row-sharded rendering: scene replicated, rays data-parallel.
# ---------------------------------------------------------------------------


def sharded_render(
    mesh: Mesh,
    scene,
    cam,
    params,
    height: int,
    width: int,
    frame_id,
    tile_rows="auto",
    tile_cols="auto",
    compact: bool = False,
):
    """render_sample with the image rows sharded over the mesh axis via shard_map.

    Each device renders its contiguous ``height/n`` row band with its own LOCAL
    band/column tiling — the ``lax.map`` tile sequencing runs per device, so a
    sky-dominated shard finishes its tiles early instead of lock-stepping with the
    worst shard's worst ray (the failure mode of the earlier GSPMD whole-frame
    version, which had to disable tiling entirely).  The scene volume is
    replicated (reads only); rays are keyed by global pixel coordinates, so the
    assembled frame matches single-device render_sample to float-ulp tolerance
    (XLA may re-associate differently under shard_map; measured ≤4e-6).
    """
    from ..render import tracer

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if height % n:
        raise ValueError(f"height {height} must divide by mesh size {n}")
    rows_local = height // n

    def shard_fn(flat, origin, cam_v, params_v, fid):
        row0 = jax.lax.axis_index(axis) * rows_local
        sc = type(scene)(flat, origin, scene.dims)
        return tracer.render_sample(
            sc, cam_v, params_v, rows_local, width, fid,
            tile_rows=tile_rows, tile_cols=tile_cols,
            row0=row0, full_height=height, compact=compact,
        )

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis, None, None),) * 3,
    )
    fid = jnp.asarray(frame_id, jnp.int32)
    with jax.default_device(mesh.devices.flat[0]):
        return jax.jit(f)(scene.flat, scene.origin, cam, params, fid)
