"""Scan-to-map pose evidence: ground-truth pose recovery.

These are the regression tests for two pipeline-breaking bugs found in
round 1:
  - association compared BODY-frame surfel centers against WORLD-frame map
    primitives (no pose transform) — candidates were the robot's
    displacement away, so wall surfels never matched and the map had no
    rotation authority;
  - the alignment factor lacked the translation-rotation lever-arm coupling
    A = [-I | [p]x], so the map could not correct heading at all.

The recovery test perturbs a known pose and checks the full 6x6 Laplace
(from association through evidence) solves back to the truth.
"""

import numpy as np

from gcslam_tpu.utils.xla import jnp, BELIEF_DTYPE
from gcslam_tpu import constants as C
from gcslam_tpu.models.config import PipelineConfig
from gcslam_tpu.models.atlas import AtlasView
from gcslam_tpu.models.batch import from_camera_and_surfels
from gcslam_tpu.ops import se3, surfels as SU, association as AS
from gcslam_tpu.ops import evidence_pose as EP

RNG = np.random.default_rng(3)


def _scene(npts=3000):
    g = np.c_[RNG.uniform(-4, 4, (npts, 2)), np.zeros(npts)]
    w1 = np.c_[np.full(npts // 2, 4.0), RNG.uniform(-4, 4, npts // 2), RNG.uniform(0, 2, npts // 2)]
    w2 = np.c_[RNG.uniform(-4, 4, npts // 2), np.full(npts // 2, -4.0), RNG.uniform(0, 2, npts // 2)]
    return np.vstack([g, w1, w2]) + RNG.normal(0, 0.005, (2 * npts, 3))


def _setup(T_true):
    cfg = PipelineConfig(n_surfel=256, surfel_voxel_size_m=0.3, with_camera=False)
    world = _scene()
    R_true = np.asarray(se3.so3_exp(jnp.asarray(T_true[3:6])))
    body = (world - T_true[:3]) @ R_true

    wp = jnp.asarray(world)
    ww = jnp.ones(world.shape[0])
    ts = jnp.zeros(world.shape[0])
    vs, _ = SU.extract_surfels(wp, ts, ww, 1024, 0.3, 3)
    view = AtlasView(
        positions=vs.positions.astype(BELIEF_DTYPE),
        directions=vs.normals, kappas=vs.kappas, weights=vs.weights * 20,
        valid=vs.valid,
        primitive_ids=jnp.arange(1024, dtype=jnp.int32),
        last_supported=jnp.zeros(1024, dtype=jnp.int32),
        tile_slot=jnp.zeros(1024, dtype=jnp.int32),
        slot=jnp.zeros(1024, dtype=jnp.int32),
    )
    bs, _ = SU.extract_surfels(jnp.asarray(body), ts, ww, cfg.n_surfel, 0.3, 3)
    mb = from_camera_and_surfels(
        jnp.zeros((C.N_FEAT, 3, 3)), jnp.zeros((C.N_FEAT, 3)),
        jnp.zeros((C.N_FEAT, C.VMF_N_LOBES, 3)), jnp.zeros(C.N_FEAT),
        jnp.zeros((C.N_FEAT, 3)), jnp.zeros(C.N_FEAT, dtype=bool), jnp.zeros(()),
        bs.positions, bs.Lambdas, bs.normals, bs.kappas,
        bs.weights, bs.timestamps, bs.valid,
    )
    return cfg, view, mb, R_true


def test_pose_recovery_from_perturbation():
    T_true = np.array([0.5, -0.3, 0.0, 0.0, 0.0, 0.15])
    cfg, view, mb, R_true = _setup(T_true)
    for dyaw, dx in [(0.03, 0.0), (-0.03, 0.1), (0.0, 0.1)]:
        z_lin = jnp.asarray(T_true + np.array([dx, 0, 0, 0, 0, dyaw]))
        assoc, _ = AS.associate_primitives_ot(mb, view, jnp.zeros((), jnp.int32), cfg, z_lin)
        L, h, _ = EP.primitive_pose_evidence(assoc, mb, view, z_lin, cfg)
        L6 = np.asarray(L)[:6, :6]
        h6 = np.asarray(h)[:6]
        delta = np.linalg.solve(L6 + 1e-6 * np.eye(6), h6)
        R0 = np.asarray(se3.so3_exp(z_lin[3:6]))
        exp_rho = R0.T @ (T_true[:3] - np.asarray(z_lin[:3]))
        exp_th = np.asarray(se3.so3_log(jnp.asarray(R0.T @ R_true)))
        expected = np.r_[exp_rho, exp_th]
        # one Gauss-Newton step recovers >=70% of the perturbation, right sign
        err0 = np.linalg.norm(expected)
        err1 = np.linalg.norm(delta - expected)
        assert err1 < 0.3 * err0 + 5e-3, (delta, expected)


def test_association_is_pose_aware():
    """Wall surfels must receive transport mass once the measurement frame is
    transported through the linearization pose (the body-vs-world bug)."""
    T_true = np.array([1.5, -0.8, 0.0, 0.0, 0.0, 0.4])
    cfg, view, mb, _ = _setup(T_true)
    z_lin = jnp.asarray(T_true)
    assoc, _ = AS.associate_primitives_ot(mb, view, jnp.zeros((), jnp.int32), cfg, z_lin)
    pi = np.asarray(assoc.responsibilities)
    nrm = np.asarray(mb.etas)  # not used; mass check below suffices
    # at the true pose the transported measurements sit on the map: most of
    # the uniform row marginal must be transported
    mass = pi.sum()
    assert mass > 0.5, mass
    # rotation authority exists (lever-arm block nonzero)
    L, h, _ = EP.primitive_pose_evidence(assoc, mb, view, z_lin, cfg)
    L6 = np.asarray(L)[:6, :6]
    assert L6[5, 5] > 1e3, L6.diagonal()
    # cross-coupling block is populated
    assert np.abs(L6[0:3, 3:6]).max() > 1.0


def test_shortlist_matches_full_pool():
    """Distance-shortlisted association (k_shortlist) must reproduce the
    full-pool candidates/responsibilities when the shortlist is wide enough:
    the final top-k_assoc is by the SAME full cost, so any divergence means
    the pruning dropped a genuine candidate."""
    T_true = np.array([0.5, -0.3, 0.0, 0.0, 0.0, 0.15])
    cfg, view, mb, _ = _setup(T_true)
    z_lin = jnp.asarray(T_true)
    seq = jnp.zeros((), jnp.int32)
    full, _ = AS.associate_primitives_ot(mb, view, seq, cfg, z_lin)

    from gcslam_tpu.ops import se3 as _se3
    R0 = jnp.asarray(se3.so3_exp(z_lin[3:6]))
    from gcslam_tpu.models.batch import mean_positions
    mpos_w = mean_positions(mb, cfg.eps_lift) @ R0.T + z_lin[None, :3]
    sl_idx = AS.shortlist_candidates(mpos_w, mb.valid, view, cfg)
    assert sl_idx.shape == (mb.valid.shape[0], cfg.k_shortlist)
    sl = AS.gather_candidates(view, sl_idx)
    pruned, cert = AS.associate_primitives_ot(mb, view, seq, cfg, z_lin,
                                              shortlist=sl)
    # valid rows: identical candidate sets and responsibilities
    ok = np.asarray(mb.valid)
    cf = np.sort(np.asarray(full.cand_pool)[ok], axis=1)
    cp = np.sort(np.asarray(pruned.cand_pool)[ok], axis=1)
    same = (cf == cp).all(axis=1)
    assert same.mean() > 0.98, same.mean()  # direction-term band reorders ~0
    # d_pos rounding differs between the matmul-expanded (full) and direct
    # squared-difference (shortlist) forms in f32; Sinkhorn amplifies it a
    # little — tolerance covers rounding only, not candidate changes.
    np.testing.assert_allclose(
        np.asarray(pruned.row_masses)[ok][same],
        np.asarray(full.row_masses)[ok][same], rtol=5e-3, atol=1e-5)
    # the pruning is certified
    from gcslam_tpu.ops.certs import TRIGGERS
    assert int(cert.triggers) & TRIGGERS["shortlist_pruning"]


def test_topk_blocked_exact():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (33, 7168)).astype(np.float32))
    vr, ir = AS._topk_blocked(x, 32)
    ve, ie = __import__("jax").lax.top_k(x, 32)
    np.testing.assert_array_equal(np.asarray(vr), np.asarray(ve))
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ie))
    # tie-break parity: constant input -> lowest indices win
    xc = jnp.zeros((3, 2048))
    _, it = AS._topk_blocked(xc, 8)
    np.testing.assert_array_equal(np.asarray(it), np.tile(np.arange(8), (3, 1)))
