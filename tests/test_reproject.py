"""Temporal-reprojection unit tests: pure gather/projection math on synthetic
history buffers (no path tracing, no heavy compiles).

The feature itself is new relative to the reference — the reference RESETS its
accumulation on camera motion (optixRenderer.cpp:458-479) and ships its temporal
denoiser disabled; these tests pin the geometry/validation semantics instead of
comparing against reference output."""

import numpy as np
import pytest

import jax.numpy as jnp

from mega_minecraft_tpu.render import camera, reproject, tracer
from mega_minecraft_tpu.render.reproject import N_MAX
from mega_minecraft_tpu.render.tracer import DEPTH_CAP, FrameBuffers

H, W = 24, 32


def _wall_setup(z0=50.0):
    """Previous frame: camera at origin looking +z at a wall z = z0; per-pixel
    stored depth is the analytic ray distance to the wall."""
    player = camera.Player(pos=np.zeros(3, np.float32), theta=0.0, phi=0.0)
    cam = player.camera_params(W, H)
    dx, dy, dz = reproject._center_dirs(cam, H, W)
    depth = z0 / np.asarray(dz)
    rng = np.random.RandomState(0)
    color = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    fbs = FrameBuffers(
        color=color,
        albedo=color * 0.5,
        normal=jnp.zeros((H, W, 3), jnp.float32),
        depth=jnp.asarray(depth.astype(np.float32)),
        nsamp=jnp.full((H, W), 7.0, jnp.float32),
    )
    return player, cam, fbs, depth


class TestReprojectHistory:
    def test_identity_camera_returns_history(self):
        player, cam, fbs, depth = _wall_setup()
        hc, ha, hn, hns = reproject.reproject_history(
            fbs, cam, cam, jnp.asarray(depth), H, W
        )
        np.testing.assert_allclose(np.asarray(hc), np.asarray(fbs.color), atol=1e-2)
        np.testing.assert_allclose(np.asarray(hns), 7.0, atol=1e-2)

    def test_one_pixel_lateral_shift(self):
        """Translating the camera along +right by one pixel's footprint at the
        wall shifts every gathered history pixel by exactly one column."""
        z0 = 50.0
        player, cam_prev, fbs, _ = _wall_setup(z0)
        shift = float(cam_prev.pixel_length[0]) * z0  # 1 px at the wall
        player2 = camera.Player(
            pos=(np.asarray(cam_prev.right) * shift).astype(np.float32),
            theta=0.0, phi=0.0,
        )
        cam_new = player2.camera_params(W, H)
        ddz = np.asarray(reproject._center_dirs(cam_new, H, W)[2])
        depth_new = jnp.asarray((z0 / ddz).astype(np.float32))
        hc, _, _, hns = reproject.reproject_history(
            fbs, cam_prev, cam_new, depth_new, H, W
        )
        hc, hns = np.asarray(hc), np.asarray(hns)
        prev = np.asarray(fbs.color)
        # new pixel x sees the wall point the previous camera saw at x−1:
        # sx_prev = sx_new − shift/z0 = sx_new − pixel_length[0], exactly (the
        # wall is ⊥ forward, so v·f = z0 for every pixel)
        got = hc[:, 1:]
        want = prev[:, : W - 1]
        ok = np.isclose(got, want, atol=2e-2).all(axis=-1)
        assert ok.mean() > 0.9, f"only {ok.mean():.2%} of shifted pixels match"
        assert (hns[:, 1:] > 6.0).mean() > 0.9

    def test_disocclusion_resets_history_length(self):
        player, cam, fbs, depth = _wall_setup()
        bad = np.asarray(fbs.depth).copy()
        bad[8:16, 10:20] = 5.0  # stored surface much closer than reprojected
        fbs = fbs._replace(depth=jnp.asarray(bad))
        _, _, _, hns = reproject.reproject_history(
            fbs, cam, cam, jnp.asarray(depth), H, W
        )
        hns = np.asarray(hns)
        assert (hns[9:15, 11:19] == 0.0).all()
        assert (hns[:4] > 6.0).all()

    def test_behind_camera_invalid(self):
        """Points that project behind the previous camera carry no history."""
        player, cam_prev, fbs, depth = _wall_setup()
        # new camera far beyond the wall, looking back: wall points are behind
        # the previous camera's image plane only if vf <= 0 — instead test a
        # new camera whose rays diverge off the previous frustum (large theta)
        player2 = camera.Player(pos=np.zeros(3, np.float32), theta=np.pi, phi=0.0)
        cam_new = player2.camera_params(W, H)
        d_new = jnp.full((H, W), 50.0, jnp.float32)
        _, _, _, hns = reproject.reproject_history(
            fbs, cam_prev, cam_new, d_new, H, W
        )
        assert float(np.asarray(hns).max()) == 0.0

    def test_sky_pixels_reproject_by_direction(self):
        """DEPTH_CAP (sky) pixels stay valid under pure rotation-free translation:
        the reprojected distance change is negligible relative to the cap."""
        player, cam_prev, fbs, _ = _wall_setup()
        fbs = fbs._replace(depth=jnp.full((H, W), DEPTH_CAP, jnp.float32))
        player2 = camera.Player(pos=np.array([3.0, 1.0, -2.0], np.float32))
        cam_new = player2.camera_params(W, H)
        d_new = jnp.full((H, W), DEPTH_CAP, jnp.float32)
        _, _, _, hns = reproject.reproject_history(
            fbs, cam_prev, cam_new, d_new, H, W
        )
        hns = np.asarray(hns)
        assert (hns[2:-2, 2:-2] > 6.0).all()


class TestBlend:
    def test_fresh_pixel_takes_sample(self):
        c = jnp.ones((H, W, 3), jnp.float32) * 0.8
        z3 = jnp.zeros((H, W, 3), jnp.float32)
        d = jnp.full((H, W), 10.0, jnp.float32)
        out = reproject._blend(jnp.zeros((H, W), jnp.float32), z3, z3, z3, c, c, c, d)
        np.testing.assert_allclose(np.asarray(out.color), 0.8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.nsamp), 1.0)

    def test_history_clip_bounds_weight(self):
        hc = jnp.zeros((H, W, 3), jnp.float32)
        c = jnp.ones((H, W, 3), jnp.float32)
        d = jnp.full((H, W), 10.0, jnp.float32)
        n_huge = jnp.full((H, W), 1e6, jnp.float32)
        out = reproject._blend(n_huge, hc, hc, hc, c, c, c, d)
        # fresh sample must keep at least 1/(N_MAX+1) influence
        np.testing.assert_allclose(np.asarray(out.color), 1.0 / (N_MAX + 1.0), rtol=1e-5)
        assert float(np.asarray(out.nsamp)[0, 0]) == N_MAX + 1.0


class TestEngineWiring:
    def test_temporal_framebuffers(self):
        fbs = tracer.init_framebuffers(6, 8, temporal=True)
        assert fbs.depth.shape == (6, 8)
        assert fbs.nsamp.shape == (6, 8)
        assert float(fbs.depth[0, 0]) == DEPTH_CAP
        legacy = tracer.init_framebuffers(6, 8)
        assert legacy.depth is None and legacy.nsamp is None
