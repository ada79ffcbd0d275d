"""Parallel associative-scan preintegration matches the sequential recursion
it replaces (the reference's 512-step lax.scan semantics)."""

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.ops import se3
from gcslam_tpu.ops.preintegration import preintegrate, imu_integration_time

RNG = np.random.default_rng(4)


def _sequential_reference(stamps, gyro, accel, w, rotvec0, bg, ba, g):
    """Direct NumPy transcription of the sequential recursion."""
    R = np.asarray(se3.so3_exp(jnp.asarray(rotvec0)))
    R_start = R.copy()
    v = np.zeros(3)
    p = np.zeros(3)
    dt = np.concatenate([stamps[1:] - stamps[:-1], [0.0]])
    dt = np.maximum(dt, 0.0)
    for k in range(len(stamps)):
        dte = w[k] * dt[k]
        a_w = R @ (accel[k] - ba) + g
        v_new = v + a_w * dte
        p = p + v * dte + 0.5 * a_w * dte * dte
        v = v_new
        R = R @ np.asarray(se3.so3_exp(jnp.asarray((gyro[k] - bg) * dte)))
    dR = R_start.T @ R
    return dR, R_start.T @ p, R_start.T @ v


def test_parallel_matches_sequential():
    M = 64
    stamps = np.cumsum(RNG.uniform(0.004, 0.006, M))
    gyro = RNG.normal(0, 0.5, (M, 3))
    accel = RNG.normal(0, 1.0, (M, 3)) + [0, 0, 9.81]
    w = RNG.uniform(0.2, 1.0, M)
    rotvec0 = RNG.normal(0, 0.5, 3)
    bg = RNG.normal(0, 0.01, 3)
    ba = RNG.normal(0, 0.05, 3)
    g = np.array([0.0, 0.0, -9.81])

    out = preintegrate(
        jnp.asarray(stamps), jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(w),
        jnp.asarray(rotvec0), jnp.asarray(bg), jnp.asarray(ba), jnp.asarray(g),
    )
    dR_ref, p_ref, v_ref = _sequential_reference(stamps, gyro, accel, w, rotvec0, bg, ba, g)
    np.testing.assert_allclose(np.asarray(out.delta_R), dR_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.delta_p), p_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.delta_v), v_ref, atol=1e-10)


def test_zero_weights_give_zero_motion():
    M = 32
    stamps = np.cumsum(np.full(M, 0.005))
    out = preintegrate(
        jnp.asarray(stamps),
        jnp.asarray(RNG.normal(0, 1, (M, 3))),
        jnp.asarray(RNG.normal(0, 1, (M, 3))),
        jnp.zeros(M),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.asarray([0.0, 0.0, -9.81]),
    )
    np.testing.assert_allclose(np.asarray(out.delta_pose), np.zeros(6), atol=1e-12)
    assert float(out.ess) == 0.0


def test_imu_integration_time_invariants():
    stamps = jnp.asarray(np.concatenate([np.arange(1.0, 1.1, 0.005), np.zeros(10)]))
    dt = imu_integration_time(stamps, jnp.asarray(1.0), jnp.asarray(1.1))
    assert 0.0 <= float(dt) <= 0.1 + 1e-9
    # fewer than 2 valid samples -> 0
    dt0 = imu_integration_time(jnp.zeros(16), jnp.asarray(0.0), jnp.asarray(1.0))
    assert float(dt0) == 0.0
