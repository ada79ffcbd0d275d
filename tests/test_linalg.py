"""Branch-free primitive kernels are total functions (models reference
test_primitives.py): magnitudes ~0 on no-op inputs; stabilization always
applied; PSD floor enforced."""

import numpy as np

from gcslam_tpu.utils.xla import jnp
from gcslam_tpu.ops import linalg
from gcslam_tpu.ops.kappa import kappa_from_resultant
from gcslam_tpu.ops.windows import smooth_window_weights

RNG = np.random.default_rng(1)


def test_psd_projection_noop_on_spd():
    A = RNG.normal(size=(5, 5))
    M = A @ A.T + 5.0 * np.eye(5)
    M_psd, cert = linalg.domain_projection_psd(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(M_psd), M, atol=1e-9)
    assert float(cert.projection_delta) < 1e-9
    assert float(cert.sym_delta) < 1e-12


def test_psd_projection_floors_negative_eigs():
    M = np.diag([1.0, -2.0, 3.0])
    M_psd, cert = linalg.domain_projection_psd(jnp.asarray(M), eps_psd=1e-12)
    eigs = np.linalg.eigvalsh(np.asarray(M_psd))
    assert eigs.min() >= 1e-12 * 0.9
    assert float(cert.projection_delta) > 1.0


def test_psd_projection_batched():
    M = RNG.normal(size=(7, 4, 4))
    M_psd, cert = linalg.domain_projection_psd(jnp.asarray(M))
    assert M_psd.shape == (7, 4, 4)
    assert cert.eig_min.shape == (7,)
    eigs = np.linalg.eigvalsh(np.asarray(M_psd))
    assert eigs.min() >= 0.9e-12


def test_spd_solve_lifted_matches_numpy():
    A = RNG.normal(size=(6, 6))
    L = A @ A.T + np.eye(6)
    b = RNG.normal(size=6)
    x, lift = linalg.spd_solve_lifted(jnp.asarray(L), jnp.asarray(b), eps_lift=1e-12)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(L, b), atol=1e-8)
    assert float(lift) == 1e-12 * 6


def test_spd_inverse_lifted():
    A = RNG.normal(size=(4, 4))
    L = A @ A.T + np.eye(4)
    L_inv, _ = linalg.spd_inverse_lifted(jnp.asarray(L), eps_lift=1e-12)
    np.testing.assert_allclose(np.asarray(L_inv), np.linalg.inv(L), atol=1e-8)


def test_inv_mass_total_on_zero_and_negative():
    inv0, ratio0 = linalg.inv_mass(jnp.asarray(0.0))
    assert np.isfinite(float(inv0))
    assert 0.9 < float(ratio0) <= 1.0
    invn, _ = linalg.inv_mass(jnp.asarray(-1e-13))
    assert np.isfinite(float(invn))


def test_safe_normalize_zero_vector():
    v, ratio = linalg.safe_normalize(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(v)))
    assert float(ratio) == 1.0


def test_kappa_continuous_and_bounded():
    R = jnp.linspace(0.0, 0.999, 500)
    k, _ = kappa_from_resultant(R)
    k_np = np.asarray(k)
    assert np.all(np.isfinite(k_np))
    assert np.all(k_np >= 0.0)
    # monotone in the low-R regime (R < blend region at 0.8)
    low = k_np[: int(0.7 * 500 / 0.999)]
    assert np.all(np.diff(low) > -1e-9)
    # no discontinuities: step bounded (conservative log-barrier blend dips
    # mid-blend by design; continuity is the contract, not monotonicity)
    steps = np.abs(np.diff(k_np))
    assert steps.max() < 2.0


def test_kappa_zero_at_zero_resultant():
    k, _ = kappa_from_resultant(jnp.asarray(0.0))
    assert abs(float(k)) < 1e-6


def test_smooth_window_weights():
    t = jnp.linspace(-1.0, 2.0, 300)
    w = smooth_window_weights(t, 0.0, 1.0, 0.01)
    w_np = np.asarray(w)
    assert np.all(w_np > 0)  # strictly positive floor
    assert w_np[150] > 0.9  # inside the window
    assert w_np[0] < 1e-6 + 1e-12  # far outside
    # smooth: bounded derivative
    assert np.abs(np.diff(w_np)).max() < 0.5


def test_smooth_interval_project():
    x = jnp.asarray([0.0, 5.0, 2000.0])
    lo = jnp.asarray([4.5, 4.5, 4.5])
    out = np.asarray(linalg.smooth_interval_project(x, lo, 1000.0))
    assert np.all(out >= 4.5)
    assert np.all(out <= 1000.0)


def test_eigh_3x3_jacobi_matches_lapack():
    """Analytic Jacobi eigh_3x3 vs numpy LAPACK on random, degenerate,
    rank-deficient, and batched symmetric matrices."""
    import numpy as np
    from gcslam_tpu.ops import linalg
    from gcslam_tpu.utils.xla import jnp

    rng = np.random.default_rng(0)
    mats = []
    for _ in range(50):
        A = rng.normal(size=(3, 3))
        mats.append(A @ A.T)                        # SPD
    mats.append(np.eye(3))                          # fully degenerate
    mats.append(np.diag([2.0, 2.0, 1.0]))           # repeated eigenvalue
    mats.append(np.zeros((3, 3)))                   # zero
    v = rng.normal(size=3)
    mats.append(np.outer(v, v))                     # rank-1
    mats.append(np.diag([1e-12, 1.0, 1e12]))        # wide spectrum
    M = np.stack(mats)

    lam, V = linalg.eigh_3x3(jnp.asarray(M))
    lam, V = np.asarray(lam), np.asarray(V)
    lam_ref = np.linalg.eigvalsh(M)
    assert np.allclose(lam, lam_ref, rtol=1e-10, atol=1e-10), np.abs(lam - lam_ref).max()
    # reconstruction + orthonormality
    rec = np.einsum("bik,bk,bjk->bij", V, lam, V)
    assert np.allclose(rec, M, rtol=1e-9, atol=1e-9)
    VtV = np.einsum("bki,bkj->bij", V, V)
    assert np.allclose(VtV, np.eye(3)[None], atol=1e-12)


def test_inv3x3_f32_extreme_scales_and_sign():
    """Review findings: (a) f32 adjugate inverse must not overflow to zero
    or to 1e38 garbage on extreme/roundoff-singular inputs (scale-normalized
    + relative ridge); (b) the det floor must preserve the sign of a tiny
    negative det."""
    import numpy as np
    from gcslam_tpu.ops import linalg
    from gcslam_tpu.utils.xla import jnp

    # f32 det overflow: diag(1e13) has det 1e39 > f32 max; inverse must be
    # finite and ~diag(1e-13), not zero
    M = jnp.asarray(np.diag([1e13, 1e13, 1e13]), dtype=jnp.float32)
    inv = np.asarray(linalg.inv3x3(M))
    assert np.all(np.isfinite(inv))
    assert np.allclose(np.diag(inv), 1e-13, rtol=1e-3)

    # f32 roundoff-singular PSD at large scale: inverse stays bounded by the
    # relative ridge (no 1e38 garbage)
    rng = np.random.default_rng(3)
    A = rng.normal(size=(3, 2)).astype(np.float32) * 1e2
    S = (A @ A.T).astype(np.float32)  # rank-2, scale ~1e4
    inv = np.asarray(linalg.inv3x3(jnp.asarray(S, dtype=jnp.float32), eps=1e-9))
    assert np.all(np.isfinite(inv))
    # ridge is 32*eps_f32*scale ~ 4e-2 -> inverse bounded by ~1/ridge
    assert np.abs(inv).max() < 1e4, np.abs(inv).max()

    # sign preservation: a genuinely negative eigenvalue (beyond the
    # relative ridge) must invert NEGATIVE — the old absolute floor replaced
    # det=-tiny with +tiny, flipping the whole inverse
    D = jnp.asarray(np.diag([1.0, 1.0, -1e-5]), dtype=jnp.float64)
    inv = np.asarray(linalg.inv3x3(D))
    assert inv[2, 2] < 0, "negative eigenvalue inverted positive"
    assert np.isclose(inv[2, 2], -1e5, rtol=1e-6)
