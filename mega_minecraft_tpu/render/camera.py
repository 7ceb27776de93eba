"""Player / fly-camera and pinhole ray generation.

TPU-native equivalent of the reference camera (reference behavior:
/root/reference/src/player/player.cpp:8-74 — pos/theta/phi → forward/right/up, move in
flattened-forward frame, pitch clamp ±1.565 rad; pixel rays
/root/reference/src/shaders/basic_shaders.cu:558-572 and fov setup
/root/reference/src/rendering/optixRenderer.cpp:428-479, fov 47°/20° zoomed).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

FOV_NORMAL = math.radians(47.0)
FOV_ZOOMED = math.radians(20.0)


class CameraParams(NamedTuple):
    position: jnp.ndarray  # [3]
    forward: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    pixel_length: jnp.ndarray  # [2]


@dataclass
class Player:
    """Host-side fly camera (player.hpp defaults: pos (0, 200, −20))."""

    pos: np.ndarray = field(default_factory=lambda: np.array([0.0, 200.0, -20.0], np.float32))
    theta: float = 0.0
    phi: float = 0.0
    zoomed: bool = False

    @property
    def forward(self) -> np.ndarray:
        st, ct = math.sin(self.theta), math.cos(self.theta)
        sp, cp = math.sin(self.phi), math.cos(self.phi)
        return np.array([st * cp, sp, ct * cp], np.float32)

    @property
    def forward_flat(self) -> np.ndarray:
        return np.array([math.sin(self.theta), 0.0, math.cos(self.theta)], np.float32)

    @property
    def right(self) -> np.ndarray:
        f = self.forward
        r = np.cross([0.0, 1.0, 0.0], f)
        return (r / np.linalg.norm(r)).astype(np.float32)

    @property
    def up(self) -> np.ndarray:
        f = self.forward
        u = np.cross(f, self.right)
        return (u / np.linalg.norm(u)).astype(np.float32)

    def move(self, dx: float, dy: float, dz: float):
        """move(input): x along right, y vertical, z along flattened forward."""
        self.pos = (
            self.pos + self.forward_flat * dz + self.right * dx + np.array([0, dy, 0], np.float32)
        ).astype(np.float32)

    def rotate(self, d_theta: float, d_phi: float):
        self.phi = max(-1.565, min(1.565, self.phi + d_phi))
        self.theta += d_theta

    def camera_params(self, width: int, height: int) -> CameraParams:
        tan_fovy = math.tan(FOV_ZOOMED if self.zoomed else FOV_NORMAL)
        yscaled = tan_fovy
        xscaled = yscaled * width / height
        pixel_length = np.array([2 * xscaled / width, 2 * yscaled / height], np.float32)
        return CameraParams(
            position=jnp.asarray(self.pos),
            forward=jnp.asarray(self.forward),
            right=jnp.asarray(self.right),
            up=jnp.asarray(self.up),
            pixel_length=jnp.asarray(pixel_length),
        )


def pixel_rays(
    cam: CameraParams,
    width: int,
    height: int,
    jitter,
    row0=0,
    full_height=None,
    col0=0,
    full_width=None,
):
    """Jittered pinhole rays for a ``height``x``width`` tile whose top-left global
    pixel is (``row0``, ``col0``) of a ``full_height``x``full_width`` frame
    (basic_shaders.cu:566-572).

    jitter: (jx, jy) arrays [height, width] in [0, 1).
    Returns (dx, dy, dz) arrays [height, width].
    """
    if full_height is None:
        full_height = height
    if full_width is None:
        full_width = width
    ix = jnp.arange(width, dtype=F32)[None, :] + jnp.asarray(col0, F32)
    iy = jnp.arange(height, dtype=F32)[:, None] + jnp.asarray(row0, F32)
    jx, jy = jitter
    sx = (ix - F32(full_width) * F32(0.5) + jx) * cam.pixel_length[0]
    # row 0 is the TOP of the presented image (the reference's D3D11 present chain
    # flips the buffer; we bake the flip into ray generation instead)
    sy = (iy - F32(full_height) * F32(0.5) + jy) * cam.pixel_length[1]
    d = (
        cam.forward[None, None, :]
        - cam.right[None, None, :] * sx[..., None]
        - cam.up[None, None, :] * sy[..., None]
    )
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    d = d / norm
    return d[..., 0], d[..., 1], d[..., 2]
