"""Host-side scheduler logic tests: spiral, budget, state routing, VBO eviction.

These cover the pure scheduling behavior (reference terrain.cpp:220-252 spiral,
65-83 action costs, 587-960 queue drains, 1009-1019 destroyFarChunkVbos) without
touching the device stages, so they run in milliseconds.
"""

import numpy as np

from mega_minecraft_tpu.terrain import scheduler as sched_mod
from mega_minecraft_tpu.terrain.scheduler import (
    ACTION_TIME,
    CHUNK_MAX_GEN_RADIUS,
    CHUNK_VBOS_GEN_RADIUS,
    STAGE_BATCH,
    ChunkState,
    TerrainScheduler,
    generate_spiral,
)


class TestSpiral:
    def test_starts_at_origin(self):
        sp = generate_spiral()
        assert tuple(sp[0]) == (0, 0)

    def test_unique_and_covers_radius(self):
        sp = generate_spiral()
        seen = {tuple(p) for p in sp}
        assert len(seen) == len(sp)
        r = CHUNK_MAX_GEN_RADIUS
        for p in [(-r, -r), (r, r), (0, r), (r, 0)]:
            assert p in seen

    def test_sorted_by_distance_roughly(self):
        # the spiral visits the origin's ring-1 neighborhood before ring-10
        sp = generate_spiral()
        idx = {tuple(p): i for i, p in enumerate(sp)}
        assert idx[(1, 0)] < idx[(10, 0)]
        assert idx[(0, 1)] < idx[(0, 10)]


class TestBudget:
    def test_pop_batch_respects_budget_and_batch_cap(self):
        s = TerrainScheduler(capacity=64, radius=0, skip_erosion=True)
        s.queues["heightfield"] = [(i, 0) for i in range(40)]
        cost = ACTION_TIME["heightfield"]
        s.action_time_left = cost * 5
        batch = s._pop_batch("heightfield", cost)
        assert len(batch) == 5
        assert s.action_time_left == 0

        s.queues["heightfield"] = [(i, 0) for i in range(40)]
        s.action_time_left = cost * 1000
        batch = s._pop_batch("heightfield", cost)
        assert len(batch) == STAGE_BATCH

    def test_erosion_needs_full_budget(self):
        s = TerrainScheduler(capacity=64, radius=0)
        s.queues["erode_zone"] = [(0, 0)]
        s.action_time_left = ACTION_TIME["erode_zone"] - 1
        s._exec_erosion()
        assert s.queues["erode_zone"]  # not drained: budget too small


class TestEviction:
    def _drawable_at(self, s, pos):
        slot = s.t.alloc(pos)
        s.t.state[slot] = int(ChunkState.DRAWABLE)
        return slot

    def test_far_drawable_demoted_and_reported(self):
        s = TerrainScheduler(capacity=64, radius=0, skip_erosion=True)
        far = (CHUNK_VBOS_GEN_RADIUS + 3, 0)
        near = (CHUNK_VBOS_GEN_RADIUS, 0)
        sf = self._drawable_at(s, far)
        sn = self._drawable_at(s, near)
        s.set_player_pos(0.0, 0.0)
        s.destroy_far_vbos()
        assert s.t.state[sf] == int(ChunkState.FILLED)
        assert s.t.state[sn] == int(ChunkState.DRAWABLE)
        assert s.vbos_destroyed == [far]

    def test_hysteresis_band_kept(self):
        s = TerrainScheduler(capacity=64, radius=0, skip_erosion=True)
        edge = (CHUNK_VBOS_GEN_RADIUS + 2, 0)
        se = self._drawable_at(s, edge)
        s.set_player_pos(0.0, 0.0)
        s.destroy_far_vbos()
        assert s.t.state[se] == int(ChunkState.DRAWABLE)


class TestRouting:
    def test_vbos_only_within_radius(self):
        s = TerrainScheduler(capacity=256, radius=0, skip_erosion=True)
        s.set_player_pos(0.0, 0.0)
        inside = (CHUNK_VBOS_GEN_RADIUS, 0)
        outside = (CHUNK_VBOS_GEN_RADIUS + 1, 0)
        for pos in (inside, outside):
            slot = s.t.alloc(pos)
            s.t.state[slot] = int(ChunkState.NEEDS_VBOS)
            s._route_chunk(pos)
        assert inside in s.queues["vbos"]
        assert outside not in s.queues["vbos"]

    def test_slot_reuse_after_release(self):
        s = TerrainScheduler(capacity=4, radius=0)
        slots = [s.t.alloc((i, 0)) for i in range(4)]
        s.t.release((0, 0))
        new = s.t.alloc((9, 9))
        assert new == slots[0]
