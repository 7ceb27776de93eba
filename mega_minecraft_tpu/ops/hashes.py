"""Deterministic integer hash + LCG random-engine primitives (vectorized, uint32).

World content in Mega Minecraft is a pure function of integer world coordinates and
hard-coded seed constants.  This module reproduces the reference's integer-mixing hash,
its thrust ``default_random_engine`` (minstd LCG, multiplier 48271 mod 2^31-1), and its
sin-dot float hashes, all with f32/u32 semantics so terrain decisions (feature placement,
random biome picks, block substitutions) are reproducible.

Reference behavior: /root/reference/src/util/rng.hpp:69-155 (hash, makeSeededRandomEngine,
rand*From* sin-dot hashes); thrust's minstd engine + uniform_real_distribution semantics.

All functions are shape-polymorphic: inputs are jnp arrays (any broadcastable shape),
outputs match.  Integer state is uint32; the LCG advance uses Schrage's algorithm so no
64-bit arithmetic is needed (TPU-friendly, works with jax_enable_x64=False).
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32

# minstd_rand parameters (thrust::default_random_engine)
LCG_M = 2147483647  # 2^31 - 1
LCG_A = 48271
_LCG_Q = LCG_M // LCG_A  # 44488
_LCG_R = LCG_M % LCG_A  # 3399
# uniform_real_distribution maps engine output in [min=1, max=m-1] to [lo, hi] via
# (x - min) / (max - min); range = m - 2.
_LCG_RANGE = float(LCG_M - 2)  # 2147483645


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x).astype(U32)


def hash_u32(a) -> jnp.ndarray:
    """Integer mixer used for all engine seeding (rng.hpp:69-78)."""
    a = _u32(a)
    a = (a + U32(0x7ED55D16)) + (a << U32(12))
    a = (a ^ U32(0xC761C23C)) ^ (a >> U32(19))
    a = (a + U32(0x165667B1)) + (a << U32(5))
    a = (a + U32(0xD3A2646C)) ^ (a << U32(9))
    a = (a + U32(0xFD7046C5)) + (a << U32(3))
    a = (a ^ U32(0xB55A4F09)) ^ (a >> U32(16))
    return a


def seed_1(x) -> jnp.ndarray:
    """makeSeededRandomEngine(x) -> initial LCG state (rng.hpp:80-84)."""
    return _engine_init(hash_u32(_u32(x)))


def seed_3(x, y, z) -> jnp.ndarray:
    """makeSeededRandomEngine(x, y, z) -> initial LCG state (rng.hpp:86-90).

    h = hash((1 << 31) | (x << 22) | y) ^ hash(z), with int wrap == uint32 wrap.
    """
    h = hash_u32(U32(1 << 31) | (_u32(x) << U32(22)) | _u32(y)) ^ hash_u32(_u32(z))
    return _engine_init(h)


def seed_4(x, y, z, w) -> jnp.ndarray:
    """makeSeededRandomEngine(x, y, z, w) -> initial LCG state (rng.hpp:92-96)."""
    h = hash_u32(
        U32(1 << 31) | (_u32(x) << U32(22)) | (_u32(y) << U32(11)) | _u32(w)
    ) ^ hash_u32(_u32(z))
    return _engine_init(h)


def _engine_init(s) -> jnp.ndarray:
    """linear_congruential_engine seeding: state = s mod m, 0 -> 1."""
    s = _u32(s) % U32(LCG_M)
    return jnp.where(s == U32(0), U32(1), s)


def lcg_next(state) -> jnp.ndarray:
    """One minstd step: state' = (48271 * state) mod (2^31 - 1), via Schrage."""
    state = _u32(state)
    hi = state // U32(_LCG_Q)
    lo = state % U32(_LCG_Q)
    # a*lo <= 48271*44487 < 2^31 and r*hi < 2^28: both fit in uint32 (and int32).
    t_pos = U32(LCG_A) * lo
    t_neg = U32(_LCG_R) * hi
    return jnp.where(t_pos >= t_neg, t_pos - t_neg, t_pos + U32(LCG_M) - t_neg)


def lcg_u01(state):
    """Draw one uniform float in [0, 1] (thrust uniform_real_distribution<float>(0,1)).

    Returns (value, new_state).  value = (x - 1) / (m - 2) where x is the new state.
    """
    state = lcg_next(state)
    v = (state - U32(1)).astype(F32) / F32(_LCG_RANGE)
    return v, state


def lcg_uniform(state, lo: float, hi: float):
    """Draw one uniform float in [lo, hi]; returns (value, new_state)."""
    v, state = lcg_u01(state)
    return v * F32(hi - lo) + F32(lo), state


# ---------------------------------------------------------------------------
# LCG jumping: state after k steps is a^k·s0 mod m in closed form, so a long
# *sequential* draw stream whose per-consumer draw COUNTS are data-independent
# can be evaluated fully in parallel — each consumer gathers a^k from a host
# precomputed power table and does one modular multiply by s0.  This removes
# the serial scan that otherwise dominates (decorators: 256-column stream).
# ---------------------------------------------------------------------------


def lcg_pow_table(n: int):
    """[n] u32 numpy table: a^k mod m for k in [0, n)."""
    import numpy as np

    out = np.empty(n, np.uint64)
    v = 1
    for k in range(n):
        out[k] = v
        v = (v * LCG_A) % LCG_M
    return out.astype(np.uint32)


def lcg_mulmod(x, y) -> jnp.ndarray:
    """(x · y) mod (2^31 − 1) for u32 inputs < 2^31, in pure u32 arithmetic.

    16-bit splitting plus Mersenne folding (2^31 ≡ 1, 2^32 ≡ 2 mod m); no
    64-bit ops, TPU-friendly.
    """
    x = _u32(x)
    y = _u32(y)
    m = U32(LCG_M)
    xh, xl = x >> U32(16), x & U32(0xFFFF)
    yh, yl = y >> U32(16), y & U32(0xFFFF)

    def fold(v):  # v < 2^32 -> congruent value <= m + 1
        return (v & m) + (v >> U32(31))

    t1 = U32(2) * xh * yh  # xh·yh·2^32 ≡ 2·xh·yh; xh,yh < 2^15 so t1 < 2^31
    mid = xh * yl + xl * yh  # < 2^32
    t2 = ((mid & U32(0x7FFF)) << U32(16)) + (mid >> U32(15))  # mid·2^16 mod-folded
    t3 = xl * yl  # < 2^32
    s = fold(t1 + fold(t2))
    s = fold(s + fold(t3))
    return jnp.where(s >= m, s - m, s)


def lcg_value_at(state0, j, pow_table) -> jnp.ndarray:
    """The uniform-[0,1] value of 0-based draw ``j`` from initial state ``state0``
    (bit-equal to calling :func:`lcg_u01` j+1 times), via ``pow_table`` =
    jnp/np array from :func:`lcg_pow_table` with length > max(j) + 1."""
    a_k = jnp.asarray(pow_table)[jnp.asarray(j, I32) + I32(1)]
    state = lcg_mulmod(a_k, state0)
    return (state - U32(1)).astype(F32) / F32(_LCG_RANGE)


# ---------------------------------------------------------------------------
# sin-dot float hashes (rng.hpp:102-155).  f32 math throughout.
# ---------------------------------------------------------------------------


def _fract(x):
    return x - jnp.floor(x)


def _sinhash(d):
    return _fract(jnp.sin(d) * F32(39021.426))


def rand1_from1(v):
    return _sinhash(jnp.asarray(v, F32) * F32(238.68))


def rand1_from2(vx, vy):
    d = jnp.asarray(vx, F32) * F32(238.68) + jnp.asarray(vy, F32) * F32(491.28)
    return _sinhash(d)


def rand1_from3(vx, vy, vz):
    d = (
        jnp.asarray(vx, F32) * F32(238.68)
        + jnp.asarray(vy, F32) * F32(491.28)
        + jnp.asarray(vz, F32) * F32(640.88)
    )
    return _sinhash(d)


def rand2_from2(vx, vy):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28)
    d1 = vx * F32(654.37) + vy * F32(560.45)
    return _sinhash(d0), _sinhash(d1)


def rand2_from3(vx, vy, vz):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    vz = jnp.asarray(vz, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28) + vz * F32(640.88)
    d1 = vx * F32(654.37) + vy * F32(560.45) + vz * F32(151.81)
    return _sinhash(d0), _sinhash(d1)


def rand3_from2(vx, vy):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28)
    d1 = vx * F32(654.37) + vy * F32(560.45)
    d2 = vx * F32(640.88) + vy * F32(151.81)
    return _sinhash(d0), _sinhash(d1), _sinhash(d2)


def rand3_from3(vx, vy, vz):
    vx = jnp.asarray(vx, F32)
    vy = jnp.asarray(vy, F32)
    vz = jnp.asarray(vz, F32)
    d0 = vx * F32(238.68) + vy * F32(491.28) + vz * F32(402.98)
    d1 = vx * F32(654.37) + vy * F32(560.45) + vz * F32(747.42)
    d2 = vx * F32(640.88) + vy * F32(151.81) + vz * F32(674.81)
    return _sinhash(d0), _sinhash(d1), _sinhash(d2)


# TEA hash (OptiX-side per-pixel RNG, src/shaders/random_number_generators.h:37-76).
def tea(val0, val1, rounds: int = 16):
    v0 = _u32(val0)
    v1 = _u32(val1)
    s0 = U32(0)
    for _ in range(rounds):
        s0 = s0 + U32(0x9E3779B9)
        v0 = v0 + (((v1 << U32(4)) + U32(0xA341316C)) ^ (v1 + s0) ^ ((v1 >> U32(5)) + U32(0xC8013EA4)))
        v1 = v1 + (((v0 << U32(4)) + U32(0xAD90777D)) ^ (v0 + s0) ^ ((v0 >> U32(5)) + U32(0x7E95761E)))
    return v0


def lcg_render(state):
    """Renderer-side quick LCG (random_number_generators.h): state' = 1664525*state + 1013904223."""
    state = _u32(state) * U32(1664525) + U32(1013904223)
    return state


def rnd(state):
    """Renderer-side uniform in [0,1): low 24 bits / 2^24; returns (value, new_state)."""
    state = lcg_render(state)
    v = (state & U32(0x00FFFFFF)).astype(F32) / F32(float(0x01000000))
    return v, state
