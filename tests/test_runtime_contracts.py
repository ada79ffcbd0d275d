"""Device-runtime contracts (reference docs/GC_SLAM.md 12.9: budget tests,
JIT-cache-stability tests, host-sync-absence tests): the replay path must
compile each config exactly once and perform NO host syncs or d2h transfers
between launch and the final output gather."""

import numpy as np

from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models import runner
from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig
from gcslam_tpu.utils.profiling import COUNTERS, compile_count


SMALL = dict(with_map=True, atlas_max_tiles=8, m_tile=64, m_tile_view=32,
             n_surfel=64, surfel_voxel_size_m=0.5)


def test_replay_host_sync_absence_and_jit_stability():
    cfg = PipelineConfig(**SMALL)
    run = generate(SyntheticConfig(n_scans=5, n_points=256))

    # Warm-up run compiles the replay program.
    state, out = runner.run_bag(run.batches, cfg)
    np.asarray(out.pose)
    n_compiled = compile_count()

    # Steady-state: same config replays with ZERO new compiles, ONE h2d
    # commit (the stacked batch tensor), and no host syncs / d2h readbacks
    # until the caller gathers outputs.
    COUNTERS.reset()
    state, out = runner.run_bag(run.batches, cfg)
    assert COUNTERS.h2d_calls == 1
    assert COUNTERS.d2h_bytes == 0
    assert COUNTERS.host_syncs == 0
    assert compile_count() == n_compiled, "replay retraced under a fixed config"

    # The output gather is the first (and only) d2h.
    pose = COUNTERS.to_host(out.pose)
    assert COUNTERS.host_syncs == 1
    assert COUNTERS.d2h_bytes == pose.nbytes
    assert np.all(np.isfinite(pose))


def test_recompile_only_on_config_change():
    # run_scan is jitted with config static: its per-function cache counts
    # one entry per distinct config (the fun-only global proxy does not).
    cache = runner.run_scan._cache_size

    cfg = PipelineConfig(**SMALL)
    run = generate(SyntheticConfig(n_scans=3, n_points=256))
    state, out = runner.run_bag(run.batches, cfg)
    np.asarray(out.pose)
    n0 = cache()
    assert n0 >= 1

    # A config with different static budgets is a NEW program (one more
    # cache entry) — budgets are compile-time constants, never dynamic.
    cfg2 = PipelineConfig(**{**SMALL, "m_tile_view": 16})
    state2, out2 = runner.run_bag(run.batches, cfg2)
    np.asarray(out2.pose)
    assert cache() == n0 + 1

    # Re-running the FIRST config hits its cache entry (no growth).
    state, out = runner.run_bag(run.batches, cfg)
    np.asarray(out.pose)
    assert cache() == n0 + 1
