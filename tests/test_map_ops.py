"""Atlas / surfel / association unit tests (models reference
test_lidar_surfel_extraction_mahex3d.py, test_primitive_map_merge_reduce.py)."""

import numpy as np

import jax
from gcslam_tpu.utils.xla import jnp
from gcslam_tpu import constants as C
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models import atlas as A
from gcslam_tpu.ops.surfels import extract_surfels
from gcslam_tpu.ops import tiling

RNG = np.random.default_rng(5)
CFG = PipelineConfig(with_map=True, atlas_max_tiles=8, m_tile=64, m_tile_view=32, n_surfel=64)


def test_surfel_extraction_plane():
    """Points on a plane -> surfels with the plane's normal and high kappa."""
    n = 1024
    pts = np.zeros((n, 3))
    pts[:, 0] = RNG.uniform(-0.5, 0.5, n)
    pts[:, 1] = RNG.uniform(-0.5, 0.5, n)
    pts[:, 2] = 0.002 * RNG.normal(size=n)  # near z=0 plane
    s, cert = extract_surfels(
        jnp.asarray(pts, dtype=jnp.float32), jnp.zeros(n), jnp.ones(n),
        n_surfel=64, voxel_size_m=0.25, min_points=3,
    )
    nv = int(s.n_valid)
    assert nv >= 4
    normals = np.asarray(s.normals)[:nv]
    # normals should be +-z (sign convention: z >= 0); cells with barely
    # min_points points can have noisy fits, so check the bulk.
    assert np.quantile(np.abs(normals[:, 2]), 0.1) > 0.9
    assert np.median(np.asarray(s.kappas)[:nv]) > 1.0
    # positions on the plane
    assert np.abs(np.asarray(s.positions)[:nv, 2]).max() < 0.05


def test_surfel_zero_weight_points_ignored():
    n = 256
    pts = RNG.normal(size=(n, 3)).astype(np.float32)
    s, _ = extract_surfels(jnp.asarray(pts), jnp.zeros(n), jnp.zeros(n), n_surfel=32)
    assert int(s.n_valid) == 0


def test_tile_ids_deterministic_and_local():
    xyz = jnp.asarray([[0.5, 0.5, 0.0], [0.6, 0.4, 0.1], [10.0, 10.0, 0.0]])
    ids = tiling.tile_ids_from_xyz(xyz, 2.0)
    assert int(ids[0]) == int(ids[1])  # same tile
    assert int(ids[0]) != int(ids[2])
    # stencil contains the center tile and has the declared size
    st = tiling.stencil_tile_ids(xyz[0], 1, 0, 2.0)
    assert st.shape[0] == C.N_STENCIL_TILES
    assert int(ids[0]) in [int(t) for t in np.asarray(st)]


def test_atlas_allocate_lookup_roundtrip():
    atlas = A.empty_atlas(CFG)
    q = jnp.asarray([111, 222, 333], dtype=jnp.int64)
    atlas, slots = A.allocate_tiles(atlas, q, jnp.asarray(1, dtype=jnp.int32))
    slots2, found = A.lookup_tiles(atlas, q)
    assert np.all(np.asarray(found))
    np.testing.assert_array_equal(np.asarray(slots), np.asarray(slots2))
    # re-allocating the same ids is idempotent
    atlas2, slots3 = A.allocate_tiles(atlas, q, jnp.asarray(2, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(slots), np.asarray(slots3))


def test_atlas_lru_eviction():
    atlas = A.empty_atlas(CFG)  # 8 tiles
    for seq in range(3):
        ids = jnp.asarray(np.arange(seq * 4, seq * 4 + 4), dtype=jnp.int64)
        atlas, _ = A.allocate_tiles(atlas, ids, jnp.asarray(seq, dtype=jnp.int32))
    # 12 ids into 8 slots: the oldest 4 must have been evicted
    _, found_old = A.lookup_tiles(atlas, jnp.asarray([0, 1, 2, 3], dtype=jnp.int64))
    _, found_new = A.lookup_tiles(atlas, jnp.asarray([8, 9, 10, 11], dtype=jnp.int64))
    assert not np.any(np.asarray(found_old))
    assert np.all(np.asarray(found_new))


def test_view_of_empty_atlas_is_invalid():
    atlas = A.empty_atlas(CFG)
    ids = jnp.asarray([5, 6, 7], dtype=jnp.int64)
    atlas, slots = A.allocate_tiles(atlas, ids, jnp.asarray(0, dtype=jnp.int32))
    view = A.extract_view(atlas, slots, jnp.ones(3, dtype=bool), CFG)
    assert not np.any(np.asarray(view.valid))
    assert view.positions.shape == (3 * CFG.m_tile_view, 3)


def test_merge_reduce_zero_budget_is_noop():
    """k_merge_pairs_tile=0 must disable merging without crashing (it used to
    fail at trace time with a 0-size indexing error)."""
    import dataclasses

    cfg = dataclasses.replace(PipelineConfig(), k_merge_pairs_tile=0)
    atlas = A.empty_atlas(cfg)
    slots = jnp.arange(3, dtype=jnp.int32)
    atlas2, n_merged = A._merge_reduce(atlas, slots, cfg)
    assert int(n_merged) == 0
    for a, b in zip(atlas, atlas2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_reduce_merges_near_pair_only():
    """Two near-duplicate Gaussians in a tile merge (moment-matched, weights
    add, loser invalidated); a distant one survives untouched."""
    cfg = CFG
    atlas = A.empty_atlas(cfg)
    Lam = np.eye(3) * 100.0  # sigma ~ 0.1 m
    mus = np.array([
        [1.0, 0.0, 0.5],      # near pair member 1
        [1.02, 0.0, 0.5],     # near pair member 2 (2 cm apart)
        [3.0, 2.0, 0.5],      # far
    ])
    T, M = atlas.weights.shape
    tslot = 2
    Lams = np.array(atlas.Lambdas)
    ths = np.array(atlas.thetas)
    ws = np.array(atlas.weights)
    vs = np.array(atlas.valid)
    pids = np.array(atlas.primitive_ids)
    for k, mu in enumerate(mus):
        Lams[tslot, k] = Lam
        ths[tslot, k] = Lam @ mu
        ws[tslot, k] = 1.0 + 0.1 * k
        vs[tslot, k] = True
        pids[tslot, k] = k
    atlas = atlas._replace(
        Lambdas=jnp.asarray(Lams), thetas=jnp.asarray(ths),
        weights=jnp.asarray(ws), valid=jnp.asarray(vs),
        primitive_ids=jnp.asarray(pids),
    )
    slots = jnp.asarray([tslot], dtype=jnp.int32)
    atlas2, n_merged = A._merge_reduce(atlas, slots, cfg)
    assert int(n_merged) == 1
    w2 = np.asarray(atlas2.weights)[tslot]
    v2 = np.asarray(atlas2.valid)[tslot]
    # winner carries the pair's summed weight; loser invalidated; far intact
    merged = np.where(np.isclose(w2, 2.1))[0]
    assert len(merged) == 1
    assert v2[2] and np.isclose(w2[2], 1.2)
    assert int(v2.sum()) == 2  # 3 -> 2 primitives
    # moment-matched mean lands between the pair
    k = merged[0]
    Lam_m = np.asarray(atlas2.Lambdas)[tslot, k]
    th_m = np.asarray(atlas2.thetas)[tslot, k]
    mu_m = np.linalg.solve(Lam_m, th_m)
    w1, w2b = 1.0, 1.1
    expect = (w1 * mus[0] + w2b * mus[1]) / (w1 + w2b)
    np.testing.assert_allclose(mu_m, expect, atol=1e-3)
