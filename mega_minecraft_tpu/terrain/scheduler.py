"""Streaming terrain scheduler: chunk slot table, state machine, action-time budget.

TPU-native equivalent of the reference's Terrain class (reference behavior:
/root/reference/src/terrain/terrain.cpp — zone/chunk hash maps, spiral scan of the
chunk window around the player, per-state work queues drained latest-pipeline-stage
first under an action-time budget (500/frame, 30 000/s; per-stage costs
terrain.cpp:65-83), zone erosion readiness over the 24×24 gathered grid, far-chunk
eviction; chunk state machine /root/reference/src/terrain/chunk.hpp:18-32).

Design: chunks are slots in fixed-capacity device-resident arrays — "a chunk" is an
index, not an object.  Stage executors assemble padded fixed-size batches and call the
jitted stage functions, so streaming never recompiles; all stage I/O stays in HBM.
Neighborhood-readiness checks (the reference's flood fills) become state-array tests
over the host-side mirror of the state machine.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..world import biomes as bio
from . import caves as caves_mod
from . import decorators as decorators_mod
from . import erosion, fill, gather, heightfield, layers
from . import feature_placement as fp
from . import features as features_mod

I16 = np.int16
I32 = np.int32


class ChunkState(enum.IntEnum):
    EMPTY = 0
    HAS_HEIGHTFIELD = 1
    NEEDS_LAYERS = 2
    HAS_LAYERS = 3
    NEEDS_EROSION = 4
    NEEDS_CAVES = 5
    NEEDS_FEATURE_PLACEMENTS = 6
    NEEDS_GATHER_FEATURE_PLACEMENTS = 7
    READY_TO_FILL = 8
    FILLED = 9
    NEEDS_VBOS = 10
    DRAWABLE = 11


# scheduler constants (terrain.cpp:65-83); budget knobs come from the config
# tree (config.py, env-overridable via MMTPU_TERRAIN_*) with the reference's
# values as defaults
from ..config import load_config as _load_config

_TCFG = _load_config().terrain
CHUNK_VBOS_GEN_RADIUS = _TCFG.chunk_vbos_gen_radius
ZONE_SIZE = _TCFG.zone_size
CHUNK_MAX_GEN_RADIUS = CHUNK_VBOS_GEN_RADIUS + ZONE_SIZE * 2
MAX_ACTION_TIME_PER_FRAME = _TCFG.max_action_time_per_frame
TOTAL_ACTION_TIME_PER_SECOND = _TCFG.total_action_time_per_second
ACTION_TIME = {
    "heightfield": 3,
    "gather_heightfield": 2,
    "layers": 5,
    "erode_zone": MAX_ACTION_TIME_PER_FRAME,
    "caves": 8,
    "feature_placements": 3,
    "gather_feature_placements": 5,
    "fill": 8,
    "vbos": MAX_ACTION_TIME_PER_FRAME // 3,
}

STAGE_BATCH = _TCFG.stage_batch  # chunks per jitted stage call (padded)


# ---------------------------------------------------------------------------
# Jitted stage programs: each is ONE device dispatch doing slot-gather → stage
# compute → slot-scatter, with the big slot arrays donated (updated in place in
# HBM).  Padding duplicates the last batch entry, whose recomputed output is
# identical, so duplicate scatter writes are benign.  Keeping gathers/scatters
# inside the jit matters doubly on a linked-TPU backend where every eager array
# op pays a dispatch round-trip and a per-process compile.
# ---------------------------------------------------------------------------

from functools import partial as _partial


@_partial(jax.jit, donate_argnums=(0, 1))
def _stage_heightfield(d_hf, d_w, slots, pos):
    hf, w = heightfield.generate_heightfield(pos)
    return d_hf.at[slots].set(hf), d_w.at[slots].set(w)


@_partial(jax.jit, donate_argnums=(0,), static_argnames=("fix_backward",))
def _stage_layers(d_layers, d_hf, d_w, nslots, slots, pos, fix_backward: bool):
    gathered = gather.gather_heightfields_batch(d_hf[nslots])
    ls = layers.generate_layers(gathered, d_w[slots], pos)
    if fix_backward:
        ls = layers.fix_backward_stratified(ls)
    return d_layers.at[slots].set(ls)


@_partial(jax.jit, donate_argnums=(0,))
def _stage_erosion(d_layers, d_hf, gslots):
    half = ZONE_SIZE // 2
    lg = d_layers[gslots]
    g = erosion.gather_zone_layers(lg, d_hf[gslots])
    eroded = erosion.erode_zone(g)
    core = erosion.scatter_zone_layers(
        lg[half : half + ZONE_SIZE, half : half + ZONE_SIZE], eroded
    ).reshape(-1, 20, 16, 16)
    fixed = layers.fix_backward_stratified(core)
    core_slots = gslots[half : half + ZONE_SIZE, half : half + ZONE_SIZE].reshape(-1)
    return d_layers.at[core_slots].set(fixed)


@jax.jit
def _stage_caves(d_hf, d_w, slots, pos):
    # NOTE: the slot scatters happen eagerly in the caller — fusing narrow-dtype
    # (i16/u8) scatters into the stage program crashes the TPU compiler
    # (SortedScatterEmitter "GetGatherType == kSublaneGather" check failure)
    cv = caves_mod.generate_caves(d_hf[slots], d_w[slots], pos)
    return (
        cv["starts"].astype(jnp.int16),
        cv["ends"].astype(jnp.int16),
        cv["bottom_biome"].astype(jnp.uint8),
        cv["top_biome"].astype(jnp.uint8),
    )


@jax.jit
def _stage_feature_placements(d_hf, d_w, d_layers, cs_b, ce_b, cb_b, ct_b, slots, pos):
    # cave arrays arrive pre-gathered ([B, ...] i32) and the per-slot list scatters
    # happen eagerly in the caller: fusing narrow/ragged gathers or scatters into the
    # stage program crashes the TPU compiler (see _stage_caves)
    pl = fp.generate_placements(
        d_hf[slots], d_w[slots], d_layers[slots], cs_b, ce_b, cb_b, ct_b, pos
    )
    return fp.compact_placements(pl, pos)


@jax.jit
def _stage_fill(d_hf, d_w, d_layers, cs_b, ce_b, cb_b, d_sf, d_cf, slots, nslots, pos):
    # cave arrays arrive pre-gathered ([B, ...] i32) — see _stage_caves note
    blocks = fill.fill_chunks(
        d_hf[slots], d_w[slots], d_layers[slots], cs_b, ce_b, pos
    )
    surf = fp.gather_from_neighborhood_batch(
        {k: v[nslots] for k, v in d_sf.items()}, bio.MAX_GATHERED_FEATURES_PER_CHUNK
    )
    cave = fp.gather_from_neighborhood_batch(
        {k: v[nslots] for k, v in d_cf.items()}, bio.MAX_GATHERED_CAVE_FEATURES_PER_CHUNK
    )
    blocks = features_mod.apply_features_batch(blocks, surf, cave, pos, d_hf[slots])
    blocks = decorators_mod.place_decorators_batch(
        blocks, d_hf[slots], d_w[slots], cs_b, ce_b, cb_b, pos
    )
    # u8 blocks scatter happens eagerly in the caller (see _stage_caves note)
    return blocks


# ---------------------------------------------------------------------------
# Stage dispatchers: pad a batch and run the jitted stage program against the
# slot table.  Shared by the pure-Python scheduler below and the native-core
# scheduler (C++ state machine, native/scheduler.cpp) at the bottom of this file.
# ---------------------------------------------------------------------------


def _pad_np(arr, n):
    if len(arr) == n:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], n - len(arr), axis=0)])


def dispatch_heightfield(t, slots_np, pos_np):
    sl = jnp.asarray(_pad_np(slots_np, STAGE_BATCH))
    pos = jnp.asarray(_pad_np(pos_np, STAGE_BATCH))
    t.d_heightfield, t.d_weights = _stage_heightfield(
        t.d_heightfield, t.d_weights, sl, pos
    )


def dispatch_layers(t, slots_np, pos_np, nslots_np, fix_backward: bool):
    sl = jnp.asarray(_pad_np(slots_np, STAGE_BATCH))
    pos = jnp.asarray(_pad_np(pos_np, STAGE_BATCH))
    nslots = jnp.asarray(_pad_np(nslots_np, STAGE_BATCH))
    t.d_layers = _stage_layers(
        t.d_layers, t.d_heightfield, t.d_weights, nslots, sl, pos,
        fix_backward=fix_backward,
    )


def dispatch_erosion(t, gslots_np):
    t.d_layers = _stage_erosion(t.d_layers, t.d_heightfield, jnp.asarray(gslots_np))


def dispatch_caves(t, slots_np, pos_np):
    sl = jnp.asarray(_pad_np(slots_np, STAGE_BATCH))
    pos = jnp.asarray(_pad_np(pos_np, STAGE_BATCH))
    cs, ce, cb, ct = _stage_caves(t.d_heightfield, t.d_weights, sl, pos)
    t.d_cave_starts = t.d_cave_starts.at[sl].set(cs)
    t.d_cave_ends = t.d_cave_ends.at[sl].set(ce)
    t.d_cave_bottom = t.d_cave_bottom.at[sl].set(cb)
    t.d_cave_top = t.d_cave_top.at[sl].set(ct)


def dispatch_feature_placements(t, slots_np, pos_np):
    sl = jnp.asarray(_pad_np(slots_np, STAGE_BATCH))
    pos = jnp.asarray(_pad_np(pos_np, STAGE_BATCH))
    lists = _stage_feature_placements(
        t.d_heightfield, t.d_weights, t.d_layers,
        t.d_cave_starts[sl].astype(jnp.int32),
        t.d_cave_ends[sl].astype(jnp.int32),
        t.d_cave_bottom[sl].astype(jnp.int32),
        t.d_cave_top[sl].astype(jnp.int32),
        sl, pos,
    )
    for k in t.d_sf:
        t.d_sf[k] = t.d_sf[k].at[sl].set(lists["surface"][k])
    for k in t.d_cf:
        t.d_cf[k] = t.d_cf[k].at[sl].set(lists["cave"][k])


def dispatch_fill(t, slots_np, pos_np, nbslots_np):
    sl = jnp.asarray(_pad_np(slots_np, STAGE_BATCH))
    pos = jnp.asarray(_pad_np(pos_np, STAGE_BATCH))
    nsl = jnp.asarray(_pad_np(nbslots_np, STAGE_BATCH))
    blocks = _stage_fill(
        t.d_heightfield, t.d_weights, t.d_layers,
        t.d_cave_starts[sl].astype(jnp.int32),
        t.d_cave_ends[sl].astype(jnp.int32),
        t.d_cave_bottom[sl].astype(jnp.int32),
        t.d_sf, t.d_cf,
        sl, nsl, pos,
    )
    t.d_blocks = t.d_blocks.at[sl].set(blocks)


def generate_spiral() -> np.ndarray:
    """Spiral scan offsets (terrain.cpp:220-252)."""
    out = []
    x = z = 0
    d = 1
    m = 1
    while True:
        while 2 * x * d < m:
            out.append((x, z))
            x += d
        if m > CHUNK_MAX_GEN_RADIUS * 2:
            return np.array(out, I32)
        while 2 * z * d < m:
            out.append((x, z))
            z += d
        d = -d
        m += 1


@dataclass
class Zone:
    pos: tuple  # world chunk coords of zone corner (multiples of ZONE_SIZE)
    queued_for_erosion: bool = False
    try_erosion: bool = False


@dataclass
class TerrainState:
    """Fixed-capacity chunk table: host state mirror + device data arrays.

    ``mesh``: optional ``jax.sharding.Mesh`` — the SLOT axis of every per-chunk
    device array is sharded over its first axis, so the streaming world state and
    the jitted stage programs scale across chips under GSPMD (stage batches
    gather/scatter across shards via XLA collectives over ICI).  ``None`` keeps
    everything on the default device.
    """

    capacity: int = 8192
    mesh: object = None

    def __post_init__(self):
        c = self.capacity
        self.state = np.zeros(c, np.uint8)
        self.chunk_pos = np.zeros((c, 2), I32)  # chunk coords
        self.in_use = np.zeros(c, bool)
        self.slot_of: dict = {}
        self.free = list(range(c - 1, -1, -1))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = NamedSharding(self.mesh, PartitionSpec(self.mesh.axis_names[0]))
            put = lambda a: jax.device_put(a, spec)
        else:
            put = lambda a: a
        # device-resident per-chunk data (slot axis sharded when a mesh is given)
        self.d_heightfield = put(jnp.zeros((c, 16, 16), jnp.float32))
        self.d_weights = put(jnp.zeros((c, 24, 16, 16), jnp.float32))
        self.d_layers = put(jnp.zeros((c, 20, 16, 16), jnp.float32))
        self.d_cave_starts = put(jnp.full((c, 16, 16, 32), 384, jnp.int16))
        self.d_cave_ends = put(jnp.full((c, 16, 16, 32), 384, jnp.int16))
        self.d_cave_bottom = put(jnp.zeros((c, 16, 16, 32), jnp.uint8))
        self.d_cave_top = put(jnp.zeros((c, 16, 16, 32), jnp.uint8))
        self.d_blocks = put(jnp.zeros((c, 16, 16, 384), jnp.uint8))
        # compacted per-chunk feature placement lists (feature 0 = none)
        fc, cc = fp.CHUNK_FEATURE_CAP, fp.CHUNK_CAVE_FEATURE_CAP
        self.d_sf = {k: put(jnp.zeros((c, fc), jnp.int32)) for k in ("feature", "x", "y", "z", "replace")}
        self.d_cf = {k: put(jnp.zeros((c, cc), jnp.int32)) for k in ("feature", "x", "y", "z", "height", "replace")}

    def alloc(self, pos) -> int:
        slot = self.free.pop()
        self.slot_of[pos] = slot
        self.state[slot] = int(ChunkState.EMPTY)
        self.chunk_pos[slot] = pos
        self.in_use[slot] = True
        return slot

    def release(self, pos):
        slot = self.slot_of.pop(pos)
        self.in_use[slot] = False
        self.state[slot] = int(ChunkState.EMPTY)
        self.free.append(slot)

    def slot(self, pos):
        return self.slot_of.get(pos, -1)

    def state_at(self, pos) -> int:
        s = self.slot_of.get(pos)
        return -1 if s is None else int(self.state[s])


def _zone_pos(cx: int, cz: int):
    return ((cx // ZONE_SIZE) * ZONE_SIZE, (cz // ZONE_SIZE) * ZONE_SIZE)


class TerrainScheduler:
    """Action-time budgeted streaming generator over the chunk slot table."""

    def __init__(
        self,
        capacity: int = 8192,
        radius: int | None = None,
        skip_erosion: bool = False,
        mesh=None,
    ):
        """skip_erosion: bypass the zone-erosion stage (the reference's
        DEBUG_SKIP_EROSION, chunk.cu:12) — required when the generation radius is
        clipped below a full 24x24 zone grid.
        mesh: optional device mesh — shards the slot tables across chips."""
        self.skip_erosion = skip_erosion
        self.t = TerrainState(capacity, mesh)
        self.spiral = generate_spiral()
        if radius is not None:
            keep = np.abs(self.spiral).max(axis=1) <= radius
            self.spiral = self.spiral[keep]
        self.zones: dict = {}
        self.queues = {k: [] for k in ACTION_TIME}
        self.action_time_left = 0.0
        self.current_chunk = (0, 0)
        self.last_chunk = None
        self.needs_update = True
        self.newly_filled: list = []
        self.vbos_destroyed: list = []  # consumed by the engine (destroyChunk analogue)
        self._queued = set()  # (stage, pos) pairs to avoid duplicate queueing
        self.timer = None  # optional utils.profiling.StageTimer

    # ------------------------------------------------------------------
    # chunk window update (updateChunks / updateChunk)
    # ------------------------------------------------------------------

    def set_player_pos(self, x: float, z: float):
        self.current_chunk = (int(np.floor(x / 16.0)), int(np.floor(z / 16.0)))

    def _neighbors_state_ok(self, cx, cz, r, min_state) -> bool:
        for dz in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if self.t.state_at((cx + dx, cz + dz)) < min_state:
                    return False
        return True

    def _route_chunk(self, pos):
        st = self.t.state_at(pos)
        if st < 0:
            return
        key = None
        s = ChunkState(st)
        if s == ChunkState.EMPTY:
            key = "heightfield"
        elif s == ChunkState.HAS_HEIGHTFIELD:
            if self._neighbors_state_ok(*pos, 1, int(ChunkState.HAS_HEIGHTFIELD)):
                key = "gather_heightfield"
        elif s == ChunkState.NEEDS_LAYERS:
            key = "layers"
        elif s == ChunkState.NEEDS_CAVES:
            key = "caves"
        elif s == ChunkState.NEEDS_FEATURE_PLACEMENTS:
            key = "feature_placements"
        elif s == ChunkState.NEEDS_GATHER_FEATURE_PLACEMENTS:
            if self._neighbors_state_ok(*pos, 3, int(ChunkState.NEEDS_GATHER_FEATURE_PLACEMENTS)):
                key = "gather_feature_placements"
        elif s == ChunkState.READY_TO_FILL:
            key = "fill"
        elif s == ChunkState.NEEDS_VBOS:
            dist = max(abs(pos[0] - self.current_chunk[0]), abs(pos[1] - self.current_chunk[1]))
            if dist <= CHUNK_VBOS_GEN_RADIUS:
                key = "vbos"
        if key is not None and (key, pos) not in self._queued:
            self.queues[key].append(pos)
            self._queued.add((key, pos))

    def update_chunks(self):
        ccx, ccz = self.current_chunk
        for dx, dz in self.spiral:
            pos = (int(ccx + dx), int(ccz + dz))
            if pos not in self.t.slot_of:
                self.t.alloc(pos)
                zp = _zone_pos(*pos)
                if zp not in self.zones:
                    self.zones[zp] = Zone(pos=zp)
            self._route_chunk(pos)

    # ------------------------------------------------------------------
    # zone erosion readiness (updateZones / isZoneReadyForErosion)
    # ------------------------------------------------------------------

    def _zone_ready_for_erosion(self, zone: Zone) -> bool:
        zx, zz = zone.pos
        # full 24×24 gathered grid (12×12 core + 6-chunk halo) must be >= HAS_LAYERS
        for dz in range(-ZONE_SIZE // 2, ZONE_SIZE + ZONE_SIZE // 2):
            for dx in range(-ZONE_SIZE // 2, ZONE_SIZE + ZONE_SIZE // 2):
                if self.t.state_at((zx + dx, zz + dz)) < int(ChunkState.HAS_LAYERS):
                    return False
        return True

    def update_zones(self):
        for zone in self.zones.values():
            if zone.try_erosion and not zone.queued_for_erosion:
                zone.try_erosion = False
                if self._zone_ready_for_erosion(zone):
                    zone.queued_for_erosion = True
                    self.queues["erode_zone"].append(zone.pos)

    # ------------------------------------------------------------------
    # stage executors — padded fixed-size batched calls into the jitted stages
    # ------------------------------------------------------------------

    def _pop_batch(self, key, cost) -> list:
        batch = []
        q = self.queues[key]
        while q and self.action_time_left >= cost and len(batch) < STAGE_BATCH:
            pos = q.pop(0)
            self._queued.discard((key, pos))
            batch.append(pos)
            self.action_time_left -= cost
            self.needs_update = True
        return batch

    def _slots(self, batch):
        return np.array([self.t.slot_of[p] for p in batch], I32)

    @staticmethod
    def _pad(arr, n):
        if len(arr) == n:
            return arr
        return np.concatenate([arr, np.repeat(arr[-1:], n - len(arr), axis=0)])

    def _exec_heightfield(self):
        batch = self._pop_batch("heightfield", ACTION_TIME["heightfield"])
        if not batch:
            return
        dispatch_heightfield(self.t, self._slots(batch), np.array(batch, I32) * 16)
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.HAS_HEIGHTFIELD)

    def _exec_gather_heightfield(self):
        batch = self._pop_batch("gather_heightfield", ACTION_TIME["gather_heightfield"])
        if not batch:
            return
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.NEEDS_LAYERS)

    def _exec_layers(self):
        batch = self._pop_batch("layers", ACTION_TIME["layers"])
        if not batch:
            return
        # gather 3×3 neighbor slots for the 18×18 halo'd heightfield
        nslots = np.zeros((len(batch), 3, 3), I32)
        for i, (cx, cz) in enumerate(batch):
            for dz in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    nslots[i, dz + 1, dx + 1] = self.t.slot_of[(cx + dx, cz + dz)]
        dispatch_layers(
            self.t, self._slots(batch), np.array(batch, I32) * 16, nslots,
            fix_backward=self.skip_erosion,
        )
        if self.skip_erosion:
            for p in batch:
                self.t.state[self.t.slot_of[p]] = int(ChunkState.NEEDS_CAVES)
            return
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.HAS_LAYERS)
            zp = _zone_pos(*p)
            # this chunk + the 3 zones toward its quadrant may now be erodible
            # (addZonesToTryErosionSet, terrain.cpp:430-457)
            self.zones[zp].try_erosion = True
            lx, lz = p[0] - zp[0], p[1] - zp[1]
            qx = -1 if lx < ZONE_SIZE // 2 else 1
            qz = -1 if lz < ZONE_SIZE // 2 else 1
            for dzp in ((qx, 0), (0, qz), (qx, qz)):
                np_pos = (zp[0] + dzp[0] * ZONE_SIZE, zp[1] + dzp[1] * ZONE_SIZE)
                if np_pos in self.zones and not self.zones[np_pos].queued_for_erosion:
                    self.zones[np_pos].try_erosion = True

    def _exec_erosion(self):
        q = self.queues["erode_zone"]
        cost = ACTION_TIME["erode_zone"]
        if not q or self.action_time_left < cost:
            return
        zone_pos = q.pop(0)
        self.action_time_left -= cost
        self.needs_update = True
        zx, zz = zone_pos
        half = ZONE_SIZE // 2
        gslots = np.zeros((24, 24), I32)
        for iz in range(24):
            for ix in range(24):
                gslots[iz, ix] = self.t.slot_of[(zx + ix - half, zz + iz - half)]
        # one dispatch: gather 24×24 → erode → scatter core + backward-stratified fix
        # (chunk.cu:717-720)
        dispatch_erosion(self.t, gslots)
        for iz in range(ZONE_SIZE):
            for ix in range(ZONE_SIZE):
                p = (zx + ix, zz + iz)
                self.t.state[self.t.slot_of[p]] = int(ChunkState.NEEDS_CAVES)

    def _exec_caves(self):
        batch = self._pop_batch("caves", ACTION_TIME["caves"])
        if not batch:
            return
        dispatch_caves(self.t, self._slots(batch), np.array(batch, I32) * 16)
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.NEEDS_FEATURE_PLACEMENTS)

    def _exec_feature_placements(self):
        batch = self._pop_batch("feature_placements", ACTION_TIME["feature_placements"])
        if not batch:
            return
        dispatch_feature_placements(self.t, self._slots(batch), np.array(batch, I32) * 16)
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.NEEDS_GATHER_FEATURE_PLACEMENTS)

    def _exec_gather_features(self):
        batch = self._pop_batch("gather_feature_placements", ACTION_TIME["gather_feature_placements"])
        if not batch:
            return
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.READY_TO_FILL)

    def _exec_fill(self):
        batch = self._pop_batch("fill", ACTION_TIME["fill"])
        if not batch:
            return
        # 49-chunk neighborhood slot table for the feature gather (chunk.cu:1158-1196)
        nb_slots = np.empty((len(batch), len(fp.GATHER_OFFSETS)), I32)
        for bi, p in enumerate(batch):
            for oi, o in enumerate(fp.GATHER_OFFSETS):
                nb_slots[bi, oi] = self.t.slot_of[(p[0] + int(o[0]), p[1] + int(o[1]))]
        # ONE dispatch: fill + feature gather/apply + decorators (padded duplicates
        # recompute identical volumes, so their duplicate scatter writes are benign)
        dispatch_fill(self.t, self._slots(batch), np.array(batch, I32) * 16, nb_slots)
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.FILLED)
        # FILLED chunks whose 4-neighborhood is FILLED become NEEDS_VBOS
        for p in batch:
            for q in [p, (p[0] + 1, p[1]), (p[0] - 1, p[1]), (p[0], p[1] + 1), (p[0], p[1] - 1)]:
                self._check_needs_vbos(q)

    def _check_needs_vbos(self, pos):
        if self.t.state_at(pos) != int(ChunkState.FILLED):
            return
        for d in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if self.t.state_at((pos[0] + d[0], pos[1] + d[1])) < int(ChunkState.FILLED):
                return
        self.t.state[self.t.slot_of[pos]] = int(ChunkState.NEEDS_VBOS)

    def _exec_vbos(self):
        batch = self._pop_batch("vbos", ACTION_TIME["vbos"])
        if not batch:
            return
        for p in batch:
            self.t.state[self.t.slot_of[p]] = int(ChunkState.DRAWABLE)
            self.newly_filled.append(p)

    def destroy_far_vbos(self):
        """DRAWABLE chunks beyond the VBO radius (+2 hysteresis) drop back to FILLED
        and are reported in ``vbos_destroyed`` for the engine to remove from the scene
        (reference behavior: Terrain::destroyFarChunkVbos, terrain.cpp:1009-1019, and
        the destroy queue drain feeding OptixRenderer::destroyChunk,
        terrain.cpp:593-606)."""
        ccx, ccz = self.current_chunk
        limit = CHUNK_VBOS_GEN_RADIUS + 2
        drawable = np.where(self.t.state == int(ChunkState.DRAWABLE))[0]
        for slot in drawable:
            cx, cz = int(self.t.chunk_pos[slot][0]), int(self.t.chunk_pos[slot][1])
            if max(abs(cx - ccx), abs(cz - ccz)) > limit:
                self.t.state[slot] = int(ChunkState.FILLED)
                self.vbos_destroyed.append((cx, cz))
                self.needs_update = True

    # ------------------------------------------------------------------
    # frame tick (Terrain::tick, terrain.cpp:587-960) — queues drain in reverse
    # pipeline order so nearly-done chunks finish first
    # ------------------------------------------------------------------

    def _timed(self, name, fn):
        if self.timer is None:
            return fn()
        with self.timer.stage(name):
            return fn()

    def tick(self, dt: float):
        if self.current_chunk != self.last_chunk:
            self.last_chunk = self.current_chunk
            self.needs_update = True
        if self.needs_update:
            self.update_zones()
            self.update_chunks()
            self.needs_update = False

        self.action_time_left = min(
            self.action_time_left + TOTAL_ACTION_TIME_PER_SECOND * dt,
            MAX_ACTION_TIME_PER_FRAME,
        )

        self._timed("vbos", self._exec_vbos)
        self._timed("fill", self._exec_fill)
        self._timed("gather_features", self._exec_gather_features)
        self._timed("feature_placements", self._exec_feature_placements)
        self._timed("caves", self._exec_caves)
        self._timed("erosion", self._exec_erosion)
        self._timed("layers", self._exec_layers)
        self._timed("gather_heightfield", self._exec_gather_heightfield)
        self._timed("heightfield", self._exec_heightfield)

    def drain(self, max_frames: int = 100000, dt: float = 1.0 / 60.0) -> int:
        """Run ticks until all queues are empty and no state changes remain
        (DEBUG_TIME_CHUNK_FILL drain semantics).  Returns frames ticked."""
        frames = 0
        idle = 0
        while idle < 3 and frames < max_frames:
            before = bytes(self.t.state)
            self.tick(dt)
            frames += 1
            busy = any(self.queues.values())
            if not busy and bytes(self.t.state) == before:
                idle += 1
                self.needs_update = True
            else:
                idle = 0
        return frames

    def drawable_count(self) -> int:
        return int((self.t.state == int(ChunkState.DRAWABLE)).sum())

    def slot_for(self, pos) -> int:
        return self.t.slot_of.get(tuple(pos), -1)

    def state_at(self, pos) -> int:
        return self.t.state_at(tuple(pos))

    def loaded_chunks(self) -> list:
        return list(self.t.slot_of)

    def zone_info(self, zone_pos) -> dict:
        z = self.zones.get(tuple(zone_pos))
        return {
            "ready": self._zone_ready_for_erosion(z) if z else False,
            "queued": z.queued_for_erosion if z else False,
        }


# ---------------------------------------------------------------------------
# Native-core scheduler: the C++ state machine (native/scheduler.cpp) plans each
# frame's batches; Python only executes the jitted device stages.
# ---------------------------------------------------------------------------


class NativeTerrainScheduler:
    """TerrainScheduler drop-in whose host logic (chunk table, state machine, work
    queues, action-time budget, zone readiness, eviction) runs in the native C++
    core — the runtime analogue of the reference's C++ Terrain class
    (/root/reference/src/terrain/terrain.cpp).  Each ``tick`` executes the core's
    flat batch plan against the device slot arrays via the shared dispatchers."""

    def __init__(
        self,
        capacity: int = 8192,
        radius: int | None = None,
        skip_erosion: bool = False,
        mesh=None,
    ):
        from ..native import sched as nsched

        self._ns = nsched
        self.skip_erosion = skip_erosion
        self.t = TerrainState(capacity, mesh)  # device arrays; host mirrors unused
        self.core = nsched.NativeSchedulerCore(capacity, radius, skip_erosion)
        self.newly_filled: list = []
        self.vbos_destroyed: list = []
        self.timer = None

    # -- engine surface ------------------------------------------------

    def set_player_pos(self, x: float, z: float):
        self.core.set_player_chunk(
            int(np.floor(x / 16.0)), int(np.floor(z / 16.0))
        )

    def destroy_far_vbos(self):
        self.vbos_destroyed.extend(self.core.destroy_far_vbos())

    def slot_for(self, pos) -> int:
        return self.core.slot_of(int(pos[0]), int(pos[1]))

    def state_at(self, pos) -> int:
        return self.core.state_at(int(pos[0]), int(pos[1]))

    def zone_info(self, zone_pos) -> dict:
        zx, zz = int(zone_pos[0]), int(zone_pos[1])
        half = ZONE_SIZE // 2
        ready = all(
            self.core.state_at(zx + dx, zz + dz) >= int(ChunkState.HAS_LAYERS)
            for dz in range(-half, ZONE_SIZE + half)
            for dx in range(-half, ZONE_SIZE + half)
        )
        return {"ready": ready, "queued": None}

    def loaded_chunks(self) -> list:
        st, cx, cz, iu = self.core.snapshot()
        idx = np.where(iu != 0)[0]
        return [(int(cx[i]), int(cz[i])) for i in idx]

    def drawable_count(self) -> int:
        return self.core.drawable_count()

    def _timed(self, name, fn):
        if self.timer is None:
            return fn()
        with self.timer.stage(name):
            return fn()

    def tick(self, dt: float):
        plan = self.core.tick(dt)
        ns = self._ns
        t = self.t
        i = 0
        while i < len(plan) and plan[i] != -1:
            st = int(plan[i])
            n = int(plan[i + 1])
            i += 2
            if st == ns.ST_VBOS:
                rec = plan[i : i + 3 * n].reshape(n, 3)
                i += 3 * n
                self.newly_filled.extend((int(r[1]), int(r[2])) for r in rec)
            elif st == ns.ST_FILL:
                w = 3 + 49
                rec = plan[i : i + w * n].reshape(n, w)
                i += w * n
                self._timed(
                    "fill",
                    lambda r=rec: dispatch_fill(
                        t, r[:, 0].copy(), r[:, 1:3] * 16, r[:, 3:].copy()
                    ),
                )
            elif st == ns.ST_GATHER_FEATURES or st == ns.ST_GATHER_HEIGHTFIELD:
                i += n  # state-only transitions; already applied in the core
            elif st == ns.ST_FEATURE_PLACEMENTS:
                rec = plan[i : i + 3 * n].reshape(n, 3)
                i += 3 * n
                self._timed(
                    "feature_placements",
                    lambda r=rec: dispatch_feature_placements(
                        t, r[:, 0].copy(), r[:, 1:3] * 16
                    ),
                )
            elif st == ns.ST_CAVES:
                rec = plan[i : i + 3 * n].reshape(n, 3)
                i += 3 * n
                self._timed(
                    "caves",
                    lambda r=rec: dispatch_caves(t, r[:, 0].copy(), r[:, 1:3] * 16),
                )
            elif st == ns.ST_EROSION:
                gslots = plan[i : i + 576].reshape(24, 24).copy()
                i += 576
                self._timed("erosion", lambda g=gslots: dispatch_erosion(t, g))
            elif st == ns.ST_LAYERS:
                w = 3 + 9
                rec = plan[i : i + w * n].reshape(n, w)
                i += w * n
                self._timed(
                    "layers",
                    lambda r=rec: dispatch_layers(
                        t, r[:, 0].copy(), r[:, 1:3] * 16,
                        r[:, 3:].reshape(n, 3, 3).copy(),
                        fix_backward=self.skip_erosion,
                    ),
                )
            elif st == ns.ST_HEIGHTFIELD:
                rec = plan[i : i + 3 * n].reshape(n, 3)
                i += 3 * n
                self._timed(
                    "heightfield",
                    lambda r=rec: dispatch_heightfield(
                        t, r[:, 0].copy(), r[:, 1:3] * 16
                    ),
                )
            else:
                raise RuntimeError(f"unknown plan stage {st}")

    def drain(self, max_frames: int = 100000, dt: float = 1.0 / 60.0) -> int:
        """Tick until all queues are empty and no state changes remain (mirrors
        TerrainScheduler.drain)."""
        frames = 0
        idle = 0
        while idle < 3 and frames < max_frames:
            before = self.core.snapshot()[0].tobytes()
            self.tick(dt)
            frames += 1
            busy = self.core.queues_busy()
            if not busy and self.core.snapshot()[0].tobytes() == before:
                idle += 1
                self.core.force_update()
            else:
                idle = 0
        return frames


def make_scheduler(
    capacity: int = 8192,
    radius: int | None = None,
    skip_erosion: bool = False,
    native: bool | None = None,
    mesh=None,
):
    """Build the native-core scheduler when the toolchain is available (or
    ``native=True``), else the pure-Python one.  ``native=None`` = auto.
    ``mesh``: optional device mesh — shards the slot tables across chips."""
    if native is None:
        from ..native import sched as nsched

        native = nsched.available()
    if native:
        return NativeTerrainScheduler(capacity, radius, skip_erosion, mesh=mesh)
    return TerrainScheduler(capacity, radius, skip_erosion, mesh=mesh)
