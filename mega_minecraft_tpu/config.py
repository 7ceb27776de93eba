"""Configuration: a real flag system replacing the reference's compile-time defines.

The reference configures everything through ~25 scattered ``#define``s
(/root/reference/src/defines.hpp:1-30, shaders/defines.glsl:1-21, chunk.cu:12-16,
main.hpp:177-183, terrain.cpp:65-83) with no CLI/config files (SURVEY.md §5).  Here
one dataclass tree holds them, overridable from environment variables
(``MMTPU_<SECTION>_<FIELD>``) or keyword arguments.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field


@dataclass
class RenderConfig:
    width: int = 1920  # main.hpp:180
    height: int = 1080
    max_ray_depth: int = 4  # basic_shaders.cu:39
    num_samples: int = 1  # basic_shaders.cu:38
    do_russian_roulette: bool = True  # basic_shaders.cu:36
    fog_scatter: float = -0.005  # basic_shaders.cu:41
    use_denoising: bool = True  # defines.hpp:11
    use_upscaling: bool = False  # defines.hpp:12 (render half-res, upscale 2x)
    reset_camera_on_scene_update: bool = True  # defines.hpp RESET_CAMERA_ON_BUILD_IAS
    zoom_fov_deg: float = 20.0  # optixRenderer.cpp:429
    fov_deg: float = 47.0  # optixRenderer.cpp:428
    #: DDA march caps (TPU-specific: lock-stepped loops; see tracer.py) — read by
    #: tracer at import as its module defaults, env-overridable (MMTPU_RENDER_*).
    #: Round-5 retune from measured step counts (tools/step_stats.py: primary
    #: max ~71 on the bench scene, bounce p99 = 32, shadow p99 = 17) and
    #: measured bias (tools/trace_bias.py at these caps vs exact-reference
    #: semantics: aerial 52.4 dB / cave 59.7 dB PSNR at 32 spp — invisible):
    #: 320/96/64 -> 160/32/24 cut 1080p from 2047 to 1623 ms/frame (v5e).
    max_trace_steps: int = 160
    bounce_trace_steps: int = 32
    shadow_trace_steps: int = 24
    #: DDA steps per while_loop iteration: >1 amortizes per-iteration loop
    #: overhead at the cost of up to N-1 wasted (alive-masked) sub-steps after
    #: the last lane resolves (measured at 1080p (40,96) tiles: 1 -> 2128 ms,
    #: 2 -> 2106, 4 -> 2047; default 4)
    dda_unroll: int = 4
    #: exact-reference trace mode: bounce/shadow marches uncapped (= max_trace_steps)
    #: and exact (park-and-resolve) alpha cutout on ALL ray types — the reference's
    #: semantics (basic_shaders.cu:604-664,1022-1068); slower, used to quantify the
    #: capped/stochastic fast path's bias (tools/trace_bias.py)
    exact_trace: bool = False
    #: perturb hit normals with the normal-map atlas (blocks_normal.png,
    #: optixRenderer.cpp:218-220).  Off by default: the reference loads the atlas
    #: but its application is commented out (basic_shaders.cu:957-958), so "on"
    #: is an extension, not parity.
    mapped_normals: bool = False


@dataclass
class TerrainConfig:
    chunk_vbos_gen_radius: int = 16  # terrain.cpp:65
    zone_size: int = 12  # terrain.hpp:17
    max_action_time_per_frame: int = 500  # terrain.cpp:71
    total_action_time_per_second: int = 30000  # terrain.cpp:72
    skip_erosion: bool = False  # chunk.cu:12 DEBUG_SKIP_EROSION
    biome_override: int | None = None  # chunk.cu:15 DEBUG_BIOME_OVERRIDE
    cave_biome_override: int | None = None  # chunk.cu:16
    sea_level: int = 128  # biome.hpp:10
    lava_level: int = 8  # biome.hpp:11
    capacity: int = 8192  # chunk slot table size (replaces chunk-id pool)
    stage_batch: int = 16
    #: golden-exact arithmetic mode (ops.hashes): correctly-rounded hash sin
    #: (_sin_cr), divide/sqrt (div_cr/sqrt_cr — the TPU VPU's own are ~65%/57%
    #: correctly rounded) and reassociation-pinned simplex3 skew sums
    #: (strict_sum).  With it, feature placements match the reference's lists
    #: EXACTLY (diff_placements: 0/49 chunks at the worst-case block grid) and
    #: the terrain noise planes are bit-equal to the reference-compiled golden
    #: generator.  Measured cost (v5e, 5x5 fused generation, round 4):
    #: featureless 1074.7 -> 692 chunks/s (~36% tax, almost all from _sin_cr in
    #: the noise stacks).  Default OFF: production generation wants the speed;
    #: parity tests force it on the TPU backend (tests/conftest.py) and
    #: bench.py benchmarks WITH it enabled, so the headline includes the tax.
    #: The MMTPU_EXACT_SIN env var wins over this field (read at import).
    exact_sin: bool = False


@dataclass
class DebugConfig:
    time_chunk_fill: bool = False  # terrain.cpp:61 DEBUG_TIME_CHUNK_FILL
    chunk_color: bool = False  # defines.glsl chunk tint overlay
    zone_color: bool = False
    profile_trace: bool = False  # emit jax.profiler traces per frame


@dataclass
class Config:
    render: RenderConfig = field(default_factory=RenderConfig)
    terrain: TerrainConfig = field(default_factory=TerrainConfig)
    debug: DebugConfig = field(default_factory=DebugConfig)


def _apply_env(cfg, prefix: str):
    for f in dataclasses.fields(cfg):
        sub = getattr(cfg, f.name)
        if dataclasses.is_dataclass(sub):
            _apply_env(sub, f"{prefix}{f.name.upper()}_")
            continue
        key = f"{prefix}{f.name.upper()}"
        if key in os.environ:
            raw = os.environ[key]
            t = type(sub) if sub is not None else str
            if t is bool:
                val = raw.lower() in ("1", "true", "yes", "on")
            elif t is int:
                val = int(raw)
            elif t is float:
                val = float(raw)
            else:
                val = raw
            setattr(cfg, f.name, val)


def load_config(**overrides) -> Config:
    """Config from defaults <- MMTPU_* environment <- keyword overrides
    (dots address nested fields: load_config(**{"render.width": 640}))."""
    cfg = Config()
    _apply_env(cfg, "MMTPU_")
    for key, val in overrides.items():
        obj = cfg
        *path, leaf = key.split(".")
        for part in path:
            obj = getattr(obj, part)
        setattr(obj, leaf, val)
    return cfg
