"""Config system: the flag tree must actually drive behavior (VERDICT r2 #6).

The reference configures via compile-time #defines (defines.hpp:1-30,
terrain.cpp:65-83); here config.load_config() feeds tracer march caps, scheduler
budgets, and the engine — these tests pin that the wiring is real, not decorative.
"""

import subprocess
import sys

from mega_minecraft_tpu import config


class TestLoadConfig:
    def test_defaults_match_reference(self):
        cfg = config.load_config()
        assert cfg.render.width == 1920
        assert cfg.render.max_ray_depth == 4
        assert cfg.terrain.max_action_time_per_frame == 500
        assert cfg.terrain.total_action_time_per_second == 30000
        assert cfg.terrain.zone_size == 12

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("MMTPU_RENDER_MAX_RAY_DEPTH", "2")
        monkeypatch.setenv("MMTPU_TERRAIN_SKIP_EROSION", "true")
        cfg = config.load_config()
        assert cfg.render.max_ray_depth == 2
        assert cfg.terrain.skip_erosion is True

    def test_kw_override_nested(self):
        cfg = config.load_config(**{"render.width": 640, "debug.time_chunk_fill": True})
        assert cfg.render.width == 640
        assert cfg.debug.time_chunk_fill is True


class TestWiring:
    def test_engine_config_from_config(self):
        from mega_minecraft_tpu.app.engine import EngineConfig

        cfg = config.load_config(
            **{
                "render.width": 320,
                "render.height": 180,
                "render.use_upscaling": True,
                "terrain.skip_erosion": True,
                "terrain.capacity": 512,
            }
        )
        ec = EngineConfig.from_config(cfg)
        assert (ec.width, ec.height) == (320, 180)
        assert ec.use_upscaling and ec.skip_erosion
        assert ec.capacity == 512

    def test_module_constants_read_env(self):
        # module-level defaults are read at import, so probe in a fresh interpreter
        code = (
            "import os;"
            "os.environ['MMTPU_RENDER_BOUNCE_TRACE_STEPS']='7';"
            "os.environ['MMTPU_RENDER_EXACT_TRACE']='1';"
            "os.environ['MMTPU_TERRAIN_MAX_ACTION_TIME_PER_FRAME']='123';"
            "os.environ['JAX_PLATFORMS']='cpu';"
            "from mega_minecraft_tpu.render import tracer;"
            "from mega_minecraft_tpu.terrain import scheduler;"
            "print(tracer.BOUNCE_TRACE_STEPS, tracer.EXACT_TRACE,"
            "      scheduler.MAX_ACTION_TIME_PER_FRAME,"
            "      scheduler.ACTION_TIME['erode_zone'])"
        )
        out = subprocess.check_output([sys.executable, "-c", code], timeout=300)
        assert out.split() == [b"7", b"True", b"123", b"123"]
