"""Fused unbalanced-Sinkhorn Pallas TPU kernel.

The XLA lowering of the fixed-K Sinkhorn loop (association._sinkhorn_
unbalanced) is ~6 tiny HLO ops per iteration on (N, K=8) tensors; at 50
iterations x 2 GN rounds that is several hundred serially-dispatched ops of
~2 us each — pure op-launch latency, no compute (SURVEY §7.1 flags exactly
this loop for a Pallas kernel). Here the WHOLE loop runs inside one kernel:
the (K, N) problem lives in VMEM (~50 KB at production budgets), each
iteration is a handful of VPU instructions, and the program costs ONE
dispatch.

Layout: the kernel works on the TRANSPOSED (K, N) cost so K=8 rides the
sublane axis and N (1024/1536, multiples of 128) rides the lane axis — the
native f32 (8, 128) tile. N is padded to a lane multiple with zero-mass
columns (a=0, cost=BIG), which contribute exactly zero to every reduction.

Math parity with association._sinkhorn_unbalanced (reference
operators/primitive_association.py:432-505): K_mat = exp(-C/eps);
u <- (a / (K v))^ua, v <- (b / (K^T u))^vb, fixed n_iters, no convergence
check; returns pi = diag(u) K diag(v). Same guards (1e-12 denominators).
"""

from __future__ import annotations

import functools

from gcslam_tpu.utils.xla import jax, jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _kernel(scal_ref, cost_t_ref, a_ref, b_ref, pi_t_ref, n_iters: int):
    eps = scal_ref[0]
    ua = scal_ref[1]
    vb = scal_ref[2]
    C = cost_t_ref[:]  # (K, Np)
    a = a_ref[:]  # (1, Np)
    b = b_ref[:]  # (K, 1)
    K_mat = jnp.exp(-C / eps)

    def it(_, uv):
        u, v = uv  # (1, Np), (K, 1)
        Ku = jnp.sum(K_mat * v, axis=0, keepdims=True)  # (1, Np)
        u = jnp.power(a / (Ku + 1e-12), ua)
        Kt_u = jnp.sum(K_mat * u, axis=1, keepdims=True)  # (K, 1)
        v = jnp.power(b / (Kt_u + 1e-12), vb)
        return u, v

    u0 = jnp.ones_like(a)
    v0 = jnp.ones_like(b)
    u, v = jax.lax.fori_loop(0, n_iters, it, (u0, v0))
    pi_t_ref[:] = u * K_mat * v


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def sinkhorn_unbalanced_pallas(
    C_mat: jnp.ndarray,  # (N, K) cost, f32
    a: jnp.ndarray,  # (N,) row marginals
    b: jnp.ndarray,  # (K,) column marginals
    epsilon,
    tau_a,
    tau_b,
    n_iters: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for association._sinkhorn_unbalanced."""
    N, K = C_mat.shape
    dt = C_mat.dtype
    eps = jnp.maximum(jnp.asarray(epsilon, dt), 1e-12)
    ua = 1.0 / (1.0 + jnp.asarray(tau_a, dt) / eps)
    vb = 1.0 / (1.0 + jnp.asarray(tau_b, dt) / eps)
    scal = jnp.stack([eps, ua, vb]).astype(jnp.float32)

    Np = ((N + _LANE - 1) // _LANE) * _LANE
    pad = Np - N
    C_t = jnp.pad(C_mat.astype(jnp.float32).T, ((0, 0), (0, pad)),
                  constant_values=1e12)  # (K, Np)
    a_p = jnp.pad(a.astype(jnp.float32)[None, :], ((0, 0), (0, pad)))  # (1, Np)
    b_c = b.astype(jnp.float32)[:, None]  # (K, 1)

    pi_t = pl.pallas_call(
        functools.partial(_kernel, n_iters=n_iters),
        out_shape=jax.ShapeDtypeStruct((K, Np), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal, C_t, a_p, b_c)
    return pi_t[:, :N].T.astype(dt)
