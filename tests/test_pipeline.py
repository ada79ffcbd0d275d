"""End-to-end pipeline invariants on synthetic data (models the reference's
audit-invariant + budget suites, test_audit_invariants.py /
test_budget_assertions.py)."""

import numpy as np
import pytest

import jax
from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models import runner
from gcslam_tpu.models.scan_step import init_state
from gcslam_tpu.models.scan_io import empty_scan_batch
from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig

SMALL = dict(
    with_map=True, atlas_max_tiles=16, m_tile=128, m_tile_view=64,
    n_surfel=128, surfel_voxel_size_m=0.5,
)


@pytest.fixture(scope="module")
def small_run():
    return generate(SyntheticConfig(n_scans=10, n_points=512))


def test_end_to_end_finite_and_tracks(small_run):
    cfg = PipelineConfig(**SMALL)
    state, out = runner.run_bag(small_run.batches, cfg)
    poses = np.asarray(out.pose)
    assert np.all(np.isfinite(poses))
    err = np.linalg.norm(poses[:, :2] - small_run.gt_poses[:, :2], axis=1)
    assert err[-1] < 0.5  # tracks within 0.5 m over 1 s of motion
    # certificates finite
    for field in out.tape._fields:
        arr = np.asarray(getattr(out.tape, field))
        assert np.all(np.isfinite(arr.astype(np.float64))), field


def test_determinism(small_run):
    """Identical inputs => identical outputs (the reference's determinism
    contract, docs/GC_SLAM.md:1150)."""
    cfg = PipelineConfig(**SMALL)
    _, out1 = runner.run_bag(small_run.batches, cfg)
    _, out2 = runner.run_bag(small_run.batches, cfg)
    np.testing.assert_array_equal(np.asarray(out1.pose), np.asarray(out2.pose))


def test_empty_scan_stays_finite(small_run):
    """Graceful degradation: a completely empty scan must not produce NaNs
    (reference backend_node.py:1700-1707 empty-scan dummy point)."""
    cfg = PipelineConfig(**SMALL)
    state = init_state(cfg)
    state, _ = runner._step_jit(state, small_run.batches[0], cfg)
    b = small_run.batches[1]
    eb = empty_scan_batch(n_points=512)._replace(
        scan_start_time=b.scan_start_time, scan_end_time=b.scan_end_time,
        t_scan=b.t_scan, t_last_scan=b.t_last_scan, dt_sec=b.dt_sec, scan_seq=b.scan_seq,
    )
    state, out = runner._step_jit(state, eb, cfg)
    assert np.all(np.isfinite(np.asarray(out.pose)))
    state, out2 = runner._step_jit(state, small_run.batches[2], cfg)
    assert np.all(np.isfinite(np.asarray(out2.pose)))


def test_hypothesis_permutation_invariance(small_run):
    """Barycenter output must be invariant to hypothesis ordering
    (reference test_audit_invariants.py order-invariance)."""
    from gcslam_tpu.ops.hypothesis import hypothesis_barycenter

    cfg = PipelineConfig(**SMALL)
    state = init_state(cfg)
    state, _ = runner._step_jit(state, small_run.batches[0], cfg)
    beliefs = state.beliefs
    w = jnp.asarray([0.4, 0.3, 0.2, 0.1])
    out1, _ = hypothesis_barycenter(beliefs, w)
    perm = jnp.asarray([2, 0, 3, 1])
    beliefs_p = jax.tree_util.tree_map(lambda x: x[perm], beliefs)
    out2, _ = hypothesis_barycenter(beliefs_p, w[perm])
    np.testing.assert_allclose(np.asarray(out1.belief.L), np.asarray(out2.belief.L), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out1.belief.h), np.asarray(out2.belief.h), atol=1e-9)


def test_budget_fail_fast():
    with pytest.raises(ValueError, match="compile-time constant"):
        PipelineConfig(k_hyp=3).validate()


def test_fixed_shapes_across_scans(small_run):
    """JIT cache stability: the step compiles once for a config; all scans
    share shapes (reference spec 12.9 jit-cache-stability)."""
    cfg = PipelineConfig(**SMALL)
    state = init_state(cfg)
    for b in small_run.batches[:3]:
        shapes_before = jax.tree_util.tree_map(lambda x: getattr(x, "shape", None), state)
        state, out = runner._step_jit(state, b, cfg)
        shapes_after = jax.tree_util.tree_map(lambda x: getattr(x, "shape", None), state)
        assert shapes_before == shapes_after


def test_loop_closure_reduces_drift():
    """LoopFactor contract: late absolute-pose evidence pulls the estimate
    back after heavy odom drift (budgeted recompose absorbs it; no iterative
    optimization)."""
    from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig

    run = generate(SyntheticConfig(n_scans=24, n_points=512, odom_drift_pos_per_m=0.5,
                                   odom_drift_yaw_per_m=0.15, seed=9))
    cfg = PipelineConfig(with_map=False)
    batches_loop = []
    for i, b in enumerate(run.batches):
        if i >= 18:
            b = b._replace(
                loop_pose=jnp.asarray(run.gt_poses[i]),
                loop_cov=jnp.asarray(np.diag([1e-4] * 3 + [1e-5] * 3)),
                loop_weight=jnp.asarray(1.0),
            )
        batches_loop.append(b)
    _, out_plain = runner.run_bag(run.batches, cfg)
    _, out_loop = runner.run_bag(batches_loop, cfg)
    e_plain = np.linalg.norm(np.asarray(out_plain.pose)[-1, :2] - run.gt_poses[-1, :2])
    e_loop = np.linalg.norm(np.asarray(out_loop.pose)[-1, :2] - run.gt_poses[-1, :2])
    assert e_loop < e_plain
    assert e_loop < 0.3


def test_unobserved_block_iw_stays_bounded():
    """Process-noise IW must not self-inflate on unobserved blocks (the
    dt-variance runaway: dPsi = r r^T + Sigma_post feeds the Q-grown prior
    variance back as a pseudo-measurement of Q; ops/iw.process_iw_suffstats
    now weights suffstats by block observability)."""
    import numpy as np
    from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig
    from gcslam_tpu.models import runner
    from gcslam_tpu.models.config import PipelineConfig
    from gcslam_tpu.models.scan_step import init_state

    run = generate(SyntheticConfig(n_scans=60, n_points=256, seed=0))
    cfg = PipelineConfig(with_map=False)
    state = init_state(cfg)
    q0 = float(np.asarray(state.process_iw.Psi[5])[0, 0] /
               max(float(np.asarray(state.process_iw.nu[5])) - 2, 0.1))
    state, out = runner.run_bag(run.batches, cfg)
    q1 = float(np.asarray(state.process_iw.Psi[5])[0, 0] /
               max(float(np.asarray(state.process_iw.nu[5])) - 2, 0.1))
    # dt block is unobserved: its IW mean must stay within 10x of the prior
    assert q1 < 10 * q0, (q0, q1)


def test_hypothesis_diversification(small_run):
    """hyp_diversify runs distinct evidence-trust profiles: beliefs separate,
    weights move toward the best-fitting profile; with it off, hypotheses
    stay bit-identical (reference parity)."""
    cfg_on = PipelineConfig(**SMALL, hyp_diversify=True)
    cfg_off = PipelineConfig(**SMALL, hyp_diversify=False)
    s_on, _ = runner.run_bag(small_run.batches, cfg_on)
    s_off, _ = runner.run_bag(small_run.batches, cfg_off)
    L_on = np.asarray(s_on.beliefs.L)
    L_off = np.asarray(s_off.beliefs.L)
    # off: all hypotheses identical
    assert np.allclose(L_off[0], L_off[1]) and np.allclose(L_off[0], L_off[3])
    # on: trust profiles separate the posteriors
    assert not np.allclose(L_on[0], L_on[1])
    w = np.asarray(s_on.hyp_weights)
    assert abs(w.sum() - 1.0) < 1e-9 and w.min() >= 0
    # weights moved off the uniform prior
    assert np.abs(w - 0.25).max() > 1e-4
