"""Temporal reprojection: carry path-traced accumulation across camera motion.

The reference resets its running-average accumulation whenever the camera moves
(/root/reference/src/rendering/optixRenderer.cpp:458-479) and relies on the OptiX
denoiser to clean the resulting 1-spp frames (its temporal-denoiser path is
scaffolded but disabled, optixRenderer.cpp:757-833 ``#if 0``).  On TPU we can do
better for the streaming flythrough: each frame's primary-hit world points are
projected into the PREVIOUS camera, the history buffers are bilinearly gathered
there, and taps are kept only where the stored first-hit distance agrees with the
reprojected one (disocclusion test).  Accumulation weight becomes a per-pixel
history length ``nsamp`` instead of the global frame id, so valid history
survives camera motion and invalid pixels restart at 1 spp — effective samples
per pixel during flight go from 1 to ``N_MAX`` without tracing more rays.

Pure data movement: one [H*W]-row gather of the packed history + VPU math — no
ray tracing, no scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import tracer
from .tracer import DEPTH_CAP, FrameBuffers

F32 = jnp.float32
I32 = jnp.int32

#: history-length clip: bounds staleness (day-night lighting drifts) while keeping
#: variance reduction ~N_MAX× on converged pixels
N_MAX = 64.0
#: a history tap is valid when its stored first-hit distance matches the
#: reprojected expectation within max(REL_TOL·dist, ABS_TOL) (voxel scale)
REL_TOL = 0.04
ABS_TOL = 0.75


def _center_dirs(cam, height: int, width: int):
    """Unjittered pixel-center ray directions for the full frame."""
    from .camera import pixel_rays

    half = jnp.full((height, width), F32(0.5))
    return pixel_rays(cam, width, height, (half, half))


def reproject_history(
    fbs: FrameBuffers, cam_prev, cam_new, depth_new, height: int, width: int
):
    """Gather (color, albedo, normal, nsamp) history for each pixel of the NEW
    camera from the previous frame's buffers.

    depth_new: [H, W] primary-hit camera distance under ``cam_new`` (DEPTH_CAP
    for sky).  Returns (color, albedo, normal [H, W, 3], nsamp [H, W]) with
    nsamp = 0 wherever the history is invalid (off-screen, behind the previous
    camera, or failing the depth-consistency test).
    """
    dx, dy, dz = _center_dirs(cam_new, height, width)
    d_eff = jnp.minimum(depth_new, F32(DEPTH_CAP))
    # world point seen by this pixel, then its offset from the previous camera
    vx = cam_new.position[0] + dx * d_eff - cam_prev.position[0]
    vy = cam_new.position[1] + dy * d_eff - cam_prev.position[1]
    vz = cam_new.position[2] + dz * d_eff - cam_prev.position[2]
    f, r, u = cam_prev.forward, cam_prev.right, cam_prev.up
    vf = vx * f[0] + vy * f[1] + vz * f[2]
    vr = vx * r[0] + vy * r[1] + vz * r[2]
    vu = vx * u[0] + vy * u[1] + vz * u[2]
    in_front = vf > F32(1e-3)
    safe_vf = jnp.where(in_front, vf, F32(1.0))
    # invert pixel_rays: d ∝ forward − right·sx − up·sy, sx = (ix − W/2 + jx)·plx
    # with jx = 0.5 at pixel centers
    px = -vr / safe_vf / cam_prev.pixel_length[0] + F32(0.5) * width - F32(0.5)
    py = -vu / safe_vf / cam_prev.pixel_length[1] + F32(0.5) * height - F32(0.5)
    # expected first-hit distance under the previous camera
    dist_prev = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    tol = jnp.maximum(F32(REL_TOL) * dist_prev, F32(ABS_TOL))

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(I32)
    y0i = y0.astype(I32)

    # packed history rows: one [H*W, 11] gather per tap fetches everything
    hist = jnp.concatenate(
        [
            fbs.color,
            fbs.albedo,
            fbs.normal,
            jnp.minimum(fbs.depth, F32(DEPTH_CAP))[..., None],
            fbs.nsamp[..., None],
        ],
        axis=-1,
    ).reshape(height * width, 11)

    acc = jnp.zeros((height, width, 11), F32)
    wsum = jnp.zeros((height, width), F32)
    for ox, oy_, bw in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        tx = x0i + ox
        ty = y0i + oy_
        inb = (tx >= 0) & (tx < width) & (ty >= 0) & (ty < height) & in_front
        idx = jnp.where(inb, ty * width + tx, 0)
        tap = hist[idx]  # [H, W, 11]
        d_tap = tap[..., 9]
        valid = inb & (jnp.abs(d_tap - dist_prev) <= tol)
        w = jnp.where(valid, bw, F32(0.0))
        acc = acc + tap * w[..., None]
        wsum = wsum + w

    ok = wsum > F32(0.25)  # demand a substantial valid bilinear footprint
    inv = jnp.where(ok, F32(1.0) / jnp.maximum(wsum, F32(1e-6)), F32(0.0))
    out = acc * inv[..., None]
    return out[..., 0:3], out[..., 3:6], out[..., 6:9], out[..., 10]


def _blend(fbs_hist_n, hc, ha, hn, c, a, n, depth):
    """One running-average step against per-pixel history of length ``nsamp``."""
    nsamp = jnp.minimum(fbs_hist_n, F32(N_MAX))
    w = F32(1.0) / (nsamp + F32(1.0))
    return FrameBuffers(
        color=hc + (c - hc) * w[..., None],
        albedo=ha + (a - ha) * w[..., None],
        normal=hn + (n - hn) * w[..., None],
        depth=depth,
        nsamp=nsamp + F32(1.0),
    )


def render_accumulate_temporal(
    fbs: FrameBuffers,
    scene,
    cam_prev,
    cam,
    params,
    height: int,
    width: int,
    frame_id,
    tile_rows: int | str | None = "auto",
    tile_cols: int | str | None = "auto",
    compact: bool = False,
) -> FrameBuffers:
    """One 1-spp sample + reprojected accumulation as a single program (the moving-
    camera analogue of tracer.render_accumulate; jit with the same statics)."""
    c, a, n, d = tracer.render_sample(
        scene, cam, params, height, width, frame_id, tile_rows, tile_cols,
        want_depth=True, compact=compact,
    )
    hc, ha, hn, hns = reproject_history(fbs, cam_prev, cam, d, height, width)
    return _blend(hns, hc, ha, hn, c, a, n, d)


def render_accumulate_static(
    fbs: FrameBuffers,
    scene,
    cam,
    params,
    height: int,
    width: int,
    frame_id,
    tile_rows: int | str | None = "auto",
    tile_cols: int | str | None = "auto",
    compact: bool = False,
) -> FrameBuffers:
    """Static-camera accumulation with per-pixel history: no reprojection gather
    (pixels map to themselves exactly), but history is still CLAMPED wherever the
    stored first-hit distance changed — streamed-in chunks re-converge within a
    few frames instead of resetting the whole frame.  The clamp is soft (history
    shortened to 3, not dropped) because a depth mismatch under a static camera
    is either a scene edit (short ghost, decays geometrically) or subpixel-jitter
    flicker on a silhouette (where averaging fg/bg is the CORRECT antialiased
    limit — a hard reset would keep those pixels at 1 spp forever)."""
    c, a, n, d = tracer.render_sample(
        scene, cam, params, height, width, frame_id, tile_rows, tile_cols,
        want_depth=True, compact=compact,
    )
    tol = jnp.maximum(F32(REL_TOL) * d, F32(ABS_TOL))
    same = jnp.abs(jnp.minimum(fbs.depth, F32(DEPTH_CAP)) - d) <= tol
    hns = jnp.where(same, fbs.nsamp, jnp.minimum(fbs.nsamp, F32(3.0)))
    return _blend(hns, fbs.color, fbs.albedo, fbs.normal, c, a, n, d)
