"""Central JAX configuration (mirrors reference common/jax_init.py:1-35).

Precision policy (TPU-first):
  - float64 is ENABLED globally: the 22D belief algebra, IW states, and all
    small dense factor math run in f64 for parity with the reference
    (its contract requires f64 for the belief algebra; on TPU f64 is
    emulated, but these matrices are 22x22 at most — latency-bound, cheap).
  - Point-cloud hot paths (deskew, binning, association cost, map scatter)
    explicitly use `POINT_DTYPE` (float32) so they map onto native TPU
    vector/matrix units at full rate.

All modules must import `jax`/`jnp` from here (or after importing the
package) so x64 is enabled before any tracing happens.
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

# dtype for the belief algebra / evidence factors (22x22 and smaller).
BELIEF_DTYPE = jnp.float64
# dtype for bulk point-cloud kernels (8192-point arrays and larger).
POINT_DTYPE = jnp.float32

__all__ = ["jax", "jnp", "BELIEF_DTYPE", "POINT_DTYPE"]
