"""Fused-pipeline parity: generate_area_fused must be bit-equal to the staged path.

generate_area (staged, host round-trips between stages) is the readable spec;
generate_area_fused(features=True) is the single-program version bench.py and the
scheduler's bulk path use.  Any divergence (wrong neighbor table, missing mask,
stage order) shows up here as a block-grid mismatch.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from mega_minecraft_tpu.terrain import pipeline


@pytest.mark.slow
@pytest.mark.parametrize("features", [False, True])
def test_fused_matches_staged(features):
    n = 3
    cx0 = cz0 = -1  # span the origin so world coords are signed
    area = pipeline.generate_area(cx0, cz0, n, n, features=features)

    pos_h = []
    for cz in range(cz0 - 1, cz0 + n + 1):
        for cx in range(cx0 - 1, cx0 + n + 1):
            pos_h.append([cx * 16, cz * 16])
    fused = pipeline.generate_area_fused(
        jnp.asarray(np.array(pos_h, np.int32)), n, n, features=features
    )

    got = np.asarray(fused["blocks"]).reshape(n, n, 16, 16, 384)
    np.testing.assert_array_equal(got, area["blocks"])
    np.testing.assert_allclose(
        np.asarray(fused["heightfield"]), np.asarray(area["heightfield"]), rtol=0, atol=0
    )
