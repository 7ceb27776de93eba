"""Engine API tests: checkpoint/resume, zoom/time controls, eviction plumbing.

These exercise the app-shell state machinery (reference main.cpp tick wiring +
OptixRenderer control API) without rendering a frame."""

import numpy as np
import pytest

from mega_minecraft_tpu.app.engine import Engine, EngineConfig


@pytest.fixture()
def engine():
    return Engine(EngineConfig(width=64, height=36, view_chunks=3, gen_radius=0, capacity=64))


@pytest.mark.slow
class TestControls:
    def test_zoom_resets_accumulation(self, engine):
        engine.frame_id = 5
        engine.set_zoomed(True)
        assert engine.player.zoomed
        assert engine.frame_id == 0
        engine.frame_id = 7
        engine.set_zoomed(True)  # no-op: already zoomed
        assert engine.frame_id == 7

    def test_time_pause_and_add(self, engine):
        st0 = engine.sun_time
        engine.toggle_time_paused()
        assert engine.time_paused
        engine.add_time(10.0)
        assert engine.sun_time == st0 + 10.0 * engine.cfg.sun_speed
        assert engine.frame_id == 0


@pytest.mark.slow
class TestDebugDumps:
    def test_force_regather_unloaded(self, engine):
        """X-key analogue on an unloaded chunk reports slot -1 and no diff."""
        out = engine.debug_force_regather()
        assert out["slot"] == -1

    def test_force_regather_streamed_chunk_matches(self, engine):
        """After streaming the player's chunk, regeneration parity must be exact
        (the heightfield is a pure function of coordinates)."""
        engine.scheduler.drain(max_frames=30)
        out = engine.debug_force_regather()
        if out["slot"] >= 0:
            assert out["regen_max_abs_diff"] == 0.0


@pytest.mark.slow
class TestCheckpoint:
    def test_roundtrip(self, engine, tmp_path):
        engine.player.pos = np.array([12.0, 180.0, -4.0], np.float32)
        engine.player.theta = 0.7
        engine.player.phi = -0.2
        engine.sun_time = 3.3
        engine.time = 42.0
        engine.scheduler.t.alloc((1, 2))
        engine.scheduler.t.alloc((-3, 4))
        p = str(tmp_path / "ckpt.json")
        engine.save_checkpoint(p)

        other = Engine(EngineConfig(width=64, height=36, view_chunks=3, gen_radius=0, capacity=64))
        other.load_checkpoint(p, regenerate=False)
        np.testing.assert_allclose(other.player.pos, engine.player.pos)
        assert other.player.theta == engine.player.theta
        assert other.player.phi == engine.player.phi
        assert other.sun_time == engine.sun_time
        assert other.time == engine.time
        assert other.frame_id == 0

    def test_upscaling_halves_render_resolution(self):
        e = Engine(EngineConfig(width=64, height=36, view_chunks=3, gen_radius=0,
                                capacity=64, use_upscaling=True))
        assert (e.render_w, e.render_h) == (32, 18)
        assert e.fbs.color.shape == (18, 32, 3)


def test_small_radius_auto_skips_erosion():
    """A clipped spiral radius < 18 can never satisfy a zone's 24x24 gathered grid,
    so the engine must fall back to skip_erosion instead of stalling at HAS_LAYERS."""
    from mega_minecraft_tpu.app.engine import Engine, EngineConfig

    eng = Engine(EngineConfig(width=32, height=16, view_chunks=5, gen_radius=4,
                              skip_erosion=False))
    assert eng.scheduler.skip_erosion
