"""Engine: the main-loop equivalent — streaming generation + rendering + camera.

TPU-native equivalent of the reference's app shell tick (reference behavior:
/root/reference/src/main.cpp:661-717 ``tick(dt)`` — player move → terrain window
update → terrain tick (budgeted generation) → camera upload → render; day-night clock
/root/reference/src/rendering/optixRenderer.cpp:878-900; accumulation reset on camera
change, optixRenderer.cpp:458-479).

The D3D11/GLFW presentation layer is replaced by an offline frame writer (PNG/PPM) —
presentation is I/O, not compute.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..render import brickmap, camera, denoise, reproject, sky, tonemap, tracer
from ..terrain.scheduler import ChunkState, TerrainScheduler, make_scheduler
from ..utils import profiling


from functools import partial


@partial(jax.jit, static_argnums=(3, 4))
def _assemble_region(d_blocks, slots, mask, gz: int, gx: int):
    """Gather a [gz*16, gx*16, 384] block region from slot-table chunks; masked-off
    cells (not DRAWABLE) become air.  Device-side — blocks never touch the host."""
    ch = jnp.take(d_blocks, slots, axis=0)  # [gz*gx, 16, 16, 384] ([z, x, y])
    ch = jnp.where(mask[:, None, None, None], ch, jnp.uint8(0))
    ch = ch.reshape(gz, gx, 16, 16, 384).transpose(0, 2, 1, 3, 4)
    return ch.reshape(gz * 16, gx * 16, 384)


@dataclass
class EngineConfig:
    width: int = 640
    height: int = 360
    view_chunks: int = 33  # scene window side (chunkVbosGenRadius*2+1)
    gen_radius: int | None = 8  # spiral clip radius (None = reference's full 40)
    capacity: int = 8192
    skip_erosion: bool = False
    sun_speed: float = -0.025  # rad/s (optixRenderer.cpp:885)
    sun_time0: float = 1.0
    use_denoising: bool = True  # reference USE_DENOISING (defines.hpp:11)
    use_upscaling: bool = False  # reference USE_UPSCALING (defines.hpp:12):
    # path-trace at half resolution, denoise, 2× upscale at present (~4× fewer rays)
    use_reprojection: bool = True  # temporal reprojection: accumulation survives
    # camera motion per-pixel (the reference resets it, optixRenderer.cpp:458-479,
    # and its temporal denoiser is disabled — see render/reproject.py)
    use_compaction: bool = False  # partition-by-aliveness bounce loop
    # (tracer.render_sample_compact); opt-in until measured faster on-chip
    native_scheduler: bool | None = None  # None = use the C++ core when available

    @classmethod
    def from_config(cls, cfg=None) -> "EngineConfig":
        """Engine settings from the config tree (config.load_config): defaults <-
        MMTPU_* environment <- the passed Config."""
        from .. import config as config_mod

        cfg = cfg or config_mod.load_config()
        return cls(
            width=cfg.render.width,
            height=cfg.render.height,
            capacity=cfg.terrain.capacity,
            skip_erosion=cfg.terrain.skip_erosion,
            use_denoising=cfg.render.use_denoising,
            use_upscaling=cfg.render.use_upscaling,
        )


class Engine:
    """Streams terrain around the player and renders accumulated path-traced frames."""

    def __init__(self, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        # hash-sin mode from the config tree (before any stage program traces;
        # MMTPU_EXACT_SIN env wins inside set_exact_sin)
        from .. import config as config_mod
        from ..ops import hashes as hashes_mod

        hashes_mod.set_exact_sin(config_mod.load_config().terrain.exact_sin)
        self.player = camera.Player()
        # zone erosion needs the full 24x24 gathered chunk grid (12x12 core +
        # 6-chunk halo, terrain.hpp:17-19); under a clipped spiral radius < 18 no
        # zone can ever become ready and every chunk would stall at HAS_LAYERS —
        # fall back to the reference's DEBUG_SKIP_EROSION behavior instead
        skip_erosion = self.cfg.skip_erosion
        if not skip_erosion and self.cfg.gen_radius is not None and self.cfg.gen_radius < 18:
            skip_erosion = True
        self.scheduler = make_scheduler(
            capacity=self.cfg.capacity,
            radius=self.cfg.gen_radius,
            skip_erosion=skip_erosion,
            native=self.cfg.native_scheduler,
        )
        n = self.cfg.view_chunks
        half = n // 2
        self.window_origin = (-half, -half)  # chunk coords of scene corner
        side = n * 16
        self.scene = brickmap.empty_scene(
            side, self.window_origin[0], self.window_origin[1]
        )
        self.time = 0.0
        self.sun_time = self.cfg.sun_time0
        self.time_paused = False
        # freecam: camera detaches from the streaming window (main.cpp:181,701 —
        # `if (!freeCam) terrain->setCurrentChunkPos(...)`)
        self.freecam = False
        self.fps = profiling.FpsCounter()
        self.frame_id = 0
        # internal render resolution (half when upscaling, optixRenderer.cpp:462-466)
        self.render_w = self.cfg.width // 2 if self.cfg.use_upscaling else self.cfg.width
        self.render_h = self.cfg.height // 2 if self.cfg.use_upscaling else self.cfg.height
        self.fbs = tracer.init_framebuffers(
            self.render_h, self.render_w, temporal=self.cfg.use_reprojection
        )
        # NOTE: no donate_argnums on the framebuffers — buffer donation through
        # this program produces invalid output aliases on the linked-TPU (axon)
        # backend (downstream reads fail with INVALID_ARGUMENT)
        statics = ("height", "width", "tile_rows", "tile_cols", "compact")
        self._render = jax.jit(tracer.render_accumulate, static_argnames=statics)
        self._render_temporal = jax.jit(
            reproject.render_accumulate_temporal, static_argnames=statics
        )
        self._render_static = jax.jit(
            reproject.render_accumulate_static, static_argnames=statics
        )
        self._prev_cam = None
        self._pending_scene_updates: list = []

    # ------------------------------------------------------------------

    #: chunks per side per batched field update.  The distance resweep window pads
    #: the region by DIST_CAP=63 blocks on each side, so updating one chunk sweeps
    #: 142² columns while a 3×3 bucket sweeps 174² — nine chunks for ~1.5× the cost
    #: of one (measured on v5e: the per-chunk path dominated flythrough scene
    #: updates at ~188 ms/frame during streaming bursts).
    UPLOAD_BUCKET = 3

    def _refresh_buckets(self, positions) -> bool:
        """Re-sync bucket-aligned scene regions covering ``positions`` from the
        scheduler's slot table: DRAWABLE chunks contribute their blocks, everything
        else is air.  One ``update_chunks`` resweep per bucket — the batched
        buildChunkAccel/destroyChunk analogue."""
        pos = [p for p in positions if self._in_window(p)]
        if not pos:
            return False
        sched = self.scheduler
        G = self.UPLOAD_BUCKET
        n = self.cfg.view_chunks
        ox, oz = self.window_origin
        drawable = int(ChunkState.DRAWABLE)
        buckets = sorted({((p[1] - oz) // G, (p[0] - ox) // G) for p in pos})
        for bz, bx in buckets:
            z_lo, x_lo = bz * G, bx * G
            gz, gx = min(G, n - z_lo), min(G, n - x_lo)
            slots = np.zeros((gz * gx,), np.int32)
            mask = np.zeros((gz * gx,), bool)
            for dz in range(gz):
                for dx in range(gx):
                    p = (ox + x_lo + dx, oz + z_lo + dz)
                    s = sched.slot_for(p)
                    if s >= 0 and sched.state_at(p) == drawable:
                        slots[dz * gx + dx] = s
                        mask[dz * gx + dx] = True
            region = _assemble_region(
                sched.t.d_blocks, jnp.asarray(slots), jnp.asarray(mask), gz, gx
            )
            self.scene = brickmap.update_chunks(self.scene, region, z_lo * 16, x_lo * 16)
        return True

    def _upload_new_chunks(self):
        """Move newly DRAWABLE chunks into the scene volume (the accel-build analogue)."""
        sched = self.scheduler
        new = list(sched.newly_filled)
        sched.newly_filled.clear()
        return self._refresh_buckets(new)

    def _in_window(self, p):
        ox, oz = self.window_origin
        n = self.cfg.view_chunks
        return ox <= p[0] < ox + n and oz <= p[1] < oz + n

    # ------------------------------------------------------------------

    def _remove_far_chunks(self) -> bool:
        """Clear destroyed-VBO chunks out of the scene volume (the destroyChunk
        analogue: reference terrain.cpp:593-606 → optixRenderer.cpp destroyChunk).
        Destroyed chunks are no longer DRAWABLE, so the bucket refresh writes air."""
        sched = self.scheduler
        gone = list(sched.vbos_destroyed)
        sched.vbos_destroyed.clear()
        return self._refresh_buckets(gone)

    def tick(self, dt: float, move=(0.0, 0.0, 0.0), rotate=(0.0, 0.0)):
        """One frame: input → streaming → scene upload → render+accumulate."""
        cam_changed = any(move) or any(rotate)
        if any(move):
            self.player.move(*move)
        if any(rotate):
            self.player.rotate(*rotate)

        if not self.freecam:
            self.scheduler.set_player_pos(
                float(self.player.pos[0]), float(self.player.pos[2])
            )
        self.scheduler.destroy_far_vbos()
        self.scheduler.tick(dt)
        scene_changed = self._remove_far_chunks()
        scene_changed = self._upload_new_chunks() or scene_changed

        self.time += dt
        if not self.time_paused:
            self.sun_time += dt * self.cfg.sun_speed
        self.fps.tick()

        params = sky.sky_params(self.sun_time, self.time)
        cam = self.player.camera_params(self.render_w, self.render_h)
        if self.cfg.use_reprojection:
            # temporal path: camera motion reprojects the history; scene changes
            # invalidate only the pixels whose first-hit depth moved (the depth
            # test inside both programs) — no whole-frame resets
            if cam_changed and self._prev_cam is not None:
                self.fbs = self._render_temporal(
                    self.fbs, self.scene, self._prev_cam, cam, params,
                    self.render_h, self.render_w, jnp.int32(self.frame_id),
                    compact=self.cfg.use_compaction,
                )
            else:
                self.fbs = self._render_static(
                    self.fbs, self.scene, cam, params, self.render_h,
                    self.render_w, jnp.int32(self.frame_id),
                    compact=self.cfg.use_compaction,
                )
            self._prev_cam = cam
        else:
            if cam_changed or scene_changed:
                self.frame_id = 0  # reset accumulation (optixRenderer.cpp:475)
            self.fbs = self._render(
                self.fbs, self.scene, cam, params, self.render_h, self.render_w,
                jnp.int32(self.frame_id), compact=self.cfg.use_compaction,
            )
        self.frame_id += 1

    def present(self) -> np.ndarray:
        """[H, W, 3] uint8 tonemapped (denoised, optionally upscaled) frame."""
        color = self.fbs.color
        if self.cfg.use_denoising:
            nsamp = getattr(self.fbs, "nsamp", None) if self.cfg.use_reprojection else None
            color = denoise.atrous_denoise(
                color, self.fbs.albedo, self.fbs.normal, nsamp=nsamp
            )
        if self.cfg.use_upscaling:
            color = denoise.upscale2x(color)
        return np.asarray(tonemap.present(color))

    def drawable_chunks(self) -> int:
        return self.scheduler.drawable_count()

    # -- reference renderer control API (OptixRenderer::setZoomed /
    #    toggleTimePaused / addTime, optixRenderer.hpp:149-153) --------------

    # -- checkpoint / resume (SURVEY.md §5): the world itself regenerates
    #    deterministically from coordinates+seeds (the reference's persistence
    #    model), so a snapshot is just camera + clocks + the loaded-chunk set ------

    def save_checkpoint(self, path: str):
        import json

        state = {
            "player": {
                "pos": [float(v) for v in self.player.pos],
                "theta": self.player.theta,
                "phi": self.player.phi,
                "zoomed": self.player.zoomed,
            },
            "time": self.time,
            "sun_time": self.sun_time,
            "time_paused": self.time_paused,
            "chunks": sorted(
                [list(map(int, p)) for p in self.scheduler.loaded_chunks()]
            ),
        }
        with open(path, "w") as f:
            json.dump(state, f)

    def load_checkpoint(self, path: str, regenerate: bool = True):
        """Restore camera/clocks and (optionally) drain regeneration of the saved
        chunk set — block content is recomputed, never stored."""
        import json

        with open(path) as f:
            state = json.load(f)
        p = state["player"]
        self.player.pos = np.asarray(p["pos"], np.float32)
        self.player.theta = p["theta"]
        self.player.phi = p["phi"]
        self.player.zoomed = p["zoomed"]
        self.time = state["time"]
        self.sun_time = state["sun_time"]
        self.time_paused = state.get("time_paused", False)
        self._reset_accumulation()
        self.scheduler.set_player_pos(float(self.player.pos[0]), float(self.player.pos[2]))
        if regenerate:
            self.scheduler.drain()
            self._upload_new_chunks()

    # -- debug dumps (the reference's O/V/L hotkeys: debugPrintCurrentChunkInfo /
    #    debugPrintCurrentZoneInfo / debugPrintCurrentColumnLayers,
    #    terrain.cpp:1043-1144; key routing main.cpp:391-431).  The 'X' hotkey
    #    (force heightfield re-gather) has no analogue: halos are recomputed from
    #    noise, never gathered. ------------------------------------------------

    def _current_chunk(self):
        return (
            int(np.floor(self.player.pos[0] / 16.0)),
            int(np.floor(self.player.pos[2] / 16.0)),
        )

    def debug_chunk_info(self) -> dict:
        """State of the chunk under the player (reference 'O' key)."""
        pos = self._current_chunk()
        st = self.scheduler.state_at(pos)
        return {
            "chunk": pos,
            "state": ChunkState(st).name if st >= 0 else "UNLOADED",
            "slot": self.scheduler.slot_for(pos),
            "drawable": st == int(ChunkState.DRAWABLE),
        }

    def debug_zone_info(self) -> dict:
        """Erosion readiness + 12x12 state grid of the player's zone ('V' key)."""
        cx, cz = self._current_chunk()
        zp = ((cx // 12) * 12, (cz // 12) * 12)
        grid = [
            [self.scheduler.state_at((zp[0] + dx, zp[1] + dz)) for dx in range(12)]
            for dz in range(12)
        ]
        info = self.scheduler.zone_info(zp)
        info.update({"zone": zp, "state_grid": grid})
        return info

    def debug_column_layers(self) -> np.ndarray:
        """[20] material-layer start heights of the player's column ('L' key)."""
        cx, cz = self._current_chunk()
        slot = self.scheduler.slot_for((cx, cz))
        if slot < 0:
            return np.full(20, np.nan, np.float32)
        lx = int(self.player.pos[0] - cx * 16)
        lz = int(self.player.pos[2] - cz * 16)
        return np.asarray(self.scheduler.t.d_layers[slot, :, lz, lx])

    def debug_force_regather(self) -> dict:
        """Recompute the player chunk's heightfield from noise and diff it against
        the streamed slot ('X' key).  The reference re-runs its neighbor gather
        (terrain.cpp debugForceGatherHeightfield); here the heightfield is a pure
        function of coordinates, so the meaningful check is regeneration parity —
        a nonzero diff would mean slot-table corruption."""
        from ..terrain import heightfield as hf_mod

        cx, cz = self._current_chunk()
        slot = self.scheduler.slot_for((cx, cz))
        if slot < 0:
            return {"chunk": (cx, cz), "slot": -1}
        fresh, _w = hf_mod.generate_heightfield(
            jnp.asarray(np.array([[cx * 16, cz * 16]], np.int32))
        )
        stored = np.asarray(self.scheduler.t.d_heightfield[slot])
        diff = float(np.abs(np.asarray(fresh)[0] - stored).max())
        return {"chunk": (cx, cz), "slot": slot, "regen_max_abs_diff": diff}

    def _reset_accumulation(self):
        self.frame_id = 0
        if self.cfg.use_reprojection:
            self.fbs = tracer.init_framebuffers(
                self.render_h, self.render_w, temporal=True
            )
            self._prev_cam = None

    def set_zoomed(self, zoomed: bool):
        if zoomed != self.player.zoomed:
            self.player.zoomed = zoomed
            self._reset_accumulation()  # fov change invalidates accumulation

    def toggle_time_paused(self):
        self.time_paused = not self.time_paused

    def add_time(self, seconds: float):
        self.sun_time += seconds * self.cfg.sun_speed
        self._reset_accumulation()  # lighting jump: history is stale everywhere


def flythrough(
    n_frames: int = 60,
    cfg: EngineConfig | None = None,
    dt: float = 1.0 / 30.0,
    forward_per_frame: float = 2.0,
    warmup_drain: bool = True,
):
    """Scripted fly-through harness: drains initial generation, then flies forward
    rendering each frame.  Returns timing/throughput stats."""
    eng = Engine(cfg)
    t0 = time.time()
    frames = eng.scheduler.drain() if warmup_drain else 0
    gen_s = time.time() - t0
    eng._upload_new_chunks()

    t0 = time.time()
    for i in range(n_frames):
        eng.tick(dt, move=(0.0, 0.0, forward_per_frame))
    img = eng.present()  # forces sync
    render_s = time.time() - t0
    return {
        "engine": eng,
        "frames": n_frames,
        "drain_frames": frames,
        "initial_gen_seconds": gen_s,
        "ms_per_frame": render_s / n_frames * 1e3,
        "drawable_chunks": eng.drawable_chunks(),
        "image": img,
    }
