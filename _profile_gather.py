"""Microbench: per-step gather cost by dtype + DDA step-count distribution."""
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/mmtpu_xla_cache")

H, W = 360, 640
N = 80 * 80 * 384  # scene-size element pool


def timeit(name, f, *args, reps=20):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:42s} {(time.time()-t0)/reps*1e3:9.2f} ms")


key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (H, W), 0, N, dtype=jnp.int32)
tab_i32 = jnp.arange(N, dtype=jnp.int32)
tab_u8 = (jnp.arange(N) % 200).astype(jnp.uint8)


def chain_gather(tab, idx, k=10):
    def body(i, acc):
        g = tab[(idx + acc) % N]
        return acc + g.astype(jnp.int32)

    return jax.lax.fori_loop(0, k, body, jnp.zeros_like(idx))


timeit("10 chained gathers i32 [H,W] lanes", jax.jit(lambda t, i: chain_gather(t, i)), tab_i32, idx)
timeit("10 chained gathers u8  [H,W] lanes", jax.jit(lambda t, i: chain_gather(t, i)), tab_u8, idx)

# flattened 1D lanes (maybe layout matters)
idxf = idx.reshape(-1)
timeit("10 chained gathers i32 flat lanes", jax.jit(lambda t, i: chain_gather(t, i)), tab_i32, idxf)

# ---- DDA step counts in the real scene ----
from mega_minecraft_tpu.render import brickmap, camera, tracer
from mega_minecraft_tpu.world.blocks import Block

vol = np.zeros((80, 80, 384), np.uint8)
vol[:, :, :100] = int(Block.STONE)
vol[:, :, 99:100] = int(Block.GRASS_BLOCK)
vol[20:24, 20:24, 100:120] = int(Block.GLOWSTONE)
chunks = vol.reshape(5, 16, 5, 16, 384).transpose(0, 2, 1, 3, 4)
scene = brickmap.build_scene(jnp.asarray(chunks), 0, 0)
player = camera.Player(pos=np.array([40.0, 130.0, -10.0], np.float32), theta=0.2, phi=-0.35)
cam = player.camera_params(W, H)

import mega_minecraft_tpu.render.tracer as T


@jax.jit
def count_steps(scene, cam):
    z = jnp.zeros((H, W), jnp.float32)
    dx, dy, dz = camera.pixel_rays(cam, W, H, (z, z))
    pos = tuple(jnp.broadcast_to(cam.position[i], (H, W)) for i in range(3))
    res = T.trace(scene, *pos, dx, dy, dz, jnp.full((H, W), jnp.uint8(0)))
    return res.t


# instrument: copy of trace loop counting per-lane steps
def trace_steps(scene, ox, oy, oz, dx, dy, dz):
    zdim, xdim, ydim = scene.field.shape
    orig = scene.origin.astype(jnp.float32)
    F32 = jnp.float32
    I32 = jnp.int32
    inv = lambda d: jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.sign(d) + 1e12 * (d == 0), 1.0 / d)
    idx_, idy_, idz_ = inv(dx), inv(dy), inv(dz)
    lo = (orig[0], orig[1], orig[2])
    hi = (orig[0] + xdim, orig[1] + ydim, orig[2] + zdim)
    tx0, tx1 = (lo[0] - ox) * idx_, (hi[0] - ox) * idx_
    ty0, ty1 = (lo[1] - oy) * idy_, (hi[1] - oy) * idy_
    tz0, tz1 = (lo[2] - oz) * idz_, (hi[2] - oz) * idz_
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)), jnp.minimum(tz0, tz1))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)), jnp.maximum(tz0, tz1))
    t_start = jnp.maximum(t_in, 0.0) + 1e-4
    alive0 = (t_out > t_start) & (t_out > 0.0)
    flat = scene.field.reshape(-1)

    def body(state):
        t, alive, hit, lane_steps, step = state
        px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
        vx = jnp.clip(jnp.floor(px - orig[0]).astype(I32), 0, xdim - 1)
        vy = jnp.clip(jnp.floor(py - orig[1]).astype(I32), 0, ydim - 1)
        vz = jnp.clip(jnp.floor(pz - orig[2]).astype(I32), 0, zdim - 1)
        val = flat[(vz * xdim + vx) * ydim + vy]
        new_hit = alive & (val > 0)
        hit = hit | new_hit
        alive = alive & ~new_hit
        bx = jnp.where(dx > 0, vx.astype(F32) + orig[0] + 1, vx.astype(F32) + orig[0])
        by = jnp.where(dy > 0, vy.astype(F32) + orig[1] + 1, vy.astype(F32) + orig[1])
        bz = jnp.where(dz > 0, vz.astype(F32) + orig[2] + 1, vz.astype(F32) + orig[2])
        tex = jnp.where(jnp.abs(dx) < 1e-12, 3e38, (bx - ox) * idx_)
        tey = jnp.where(jnp.abs(dy) < 1e-12, 3e38, (by - oy) * idy_)
        tez = jnp.where(jnp.abs(dz) < 1e-12, 3e38, (bz - oz) * idz_)
        t_exit = jnp.minimum(jnp.minimum(tex, tey), tez)
        skip = (-val - 1).astype(F32)
        t_next = jnp.maximum(t + jnp.maximum(skip, 0.0), t_exit)
        t_next = jnp.maximum(t_next, t) * 1.00001 + 1e-4
        t = jnp.where(alive, t_next, t)
        lane_steps = lane_steps + alive.astype(I32)
        alive = alive & (t < t_out)
        return t, alive, hit, lane_steps, step + 1

    def cond(state):
        return jnp.any(state[1]) & (state[4] < 320)

    t0 = jnp.where(alive0, t_start, 1e20)
    init = (t0, alive0, jnp.zeros_like(alive0), jnp.zeros(ox.shape, I32), jnp.zeros((), I32))
    t, _, hit, lane_steps, total = jax.lax.while_loop(cond, body, init)
    return lane_steps, total


@jax.jit
def steps(scene, cam):
    z = jnp.zeros((H, W), jnp.float32)
    dx, dy, dz = camera.pixel_rays(cam, W, H, (z, z))
    pos = tuple(jnp.broadcast_to(cam.position[i], (H, W)) for i in range(3))
    return trace_steps(scene, *pos, dx, dy, dz)


ls, total = steps(scene, cam)
ls = np.asarray(ls)
print(f"loop iterations (whole image): {int(np.asarray(total))}")
print(f"per-lane steps: mean {ls.mean():.1f}  p50 {np.percentile(ls,50):.0f}  p95 {np.percentile(ls,95):.0f}  p99 {np.percentile(ls,99):.0f}  max {ls.max()}")
