"""Region-regroup index tables: spatial-correctness properties + the exact
reference ordering (incl. quirk Q8)."""

import numpy as np

import jax.numpy as jnp

from duoformer_tcga_tpu.models import regroup


def test_stage3_identity():
    idx = regroup.region_index("3")
    np.testing.assert_array_equal(idx[:, 0], np.arange(49))


def test_stage2_column_major_quirk():
    """Q8: 2x2 blocks enumerated [tl, bl, tr, br] (model.py:114-121)."""
    idx = regroup.region_index("2")
    # region (r=0, c=0): positions (0,0),(1,0),(0,1),(1,1) in the 14x14 grid
    np.testing.assert_array_equal(idx[0], [0, 14, 1, 15])
    # region (r=2, c=3)
    r, c = 2, 3
    expect = [2 * r * 14 + 2 * c, (2 * r + 1) * 14 + 2 * c,
              2 * r * 14 + 2 * c + 1, (2 * r + 1) * 14 + 2 * c + 1]
    np.testing.assert_array_equal(idx[r * 7 + c], expect)


def test_stage01_row_major():
    idx1 = regroup.region_index("1")
    # region 0: rows 0..3, cols 0..3 of the 28x28 grid, row-major
    expect = [i * 28 + j for i in range(4) for j in range(4)]
    np.testing.assert_array_equal(idx1[0], expect)
    idx0 = regroup.region_index("0")
    expect = [i * 56 + j for i in range(8) for j in range(8)]
    np.testing.assert_array_equal(idx0[0], expect)


def test_each_position_used_exactly_once():
    for s in ["0", "1", "2", "3"]:
        idx = regroup.region_index(s)
        n = regroup.STAGE_GRID[s] ** 2
        assert sorted(idx.ravel().tolist()) == list(range(n))


def test_spatial_alignment():
    """Every token gathered for region p must lie inside region p's
    spatial footprint."""
    for s in ["0", "1", "2"]:
        g = regroup.STAGE_GRID[s]
        f = g // 7   # fine cells per region side
        idx = regroup.region_index(s)
        for p in range(49):
            r, c = divmod(p, 7)
            for pos in idx[p]:
                rr, cc = divmod(int(pos), g)
                assert r * f <= rr < (r + 1) * f
                assert c * f <= cc < (c + 1) * f


def test_regroup_shapes_and_values():
    B, C = 2, 5
    feats = {}
    for s in ["3", "2"]:
        g = regroup.STAGE_GRID[s]
        feats[s] = jnp.arange(B * g * g * C, dtype=jnp.float32).reshape(B, g, g, C)
    out = regroup.regroup(feats, ["3", "2"])
    assert out.shape == (B, 49, 5, C)
    # token 0 of region p == stage-3 cell p
    flat3 = np.asarray(feats["3"]).reshape(B, 49, C)
    np.testing.assert_array_equal(np.asarray(out[:, :, 0, :]), flat3)


def test_layout_regroup_matches_gather_reference():
    """The reshape/transpose regroup must be BITWISE equal to the
    index-table gather for every stage (incl. Q8's column-major 14-grid)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from duoformer_tcga_tpu.models import regroup as rg

    key = jax.random.PRNGKey(0)
    feats = {
        s: jax.random.normal(jax.random.fold_in(key, int(s)),
                             (2, rg.STAGE_GRID[s], rg.STAGE_GRID[s], 16))
        for s in ("0", "1", "2", "3")
    }
    for stages in (["3"], ["3", "2"], ["3", "2", "1"], ["3", "2", "1", "0"]):
        a = rg.regroup(feats, stages)
        b = rg.regroup_gather(feats, stages)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
