"""Micro-benchmark: scatter-add strategies for the atlas fuse / surfel
moment accumulation, at the pipeline's exact production shapes.

The map update is scatter-dominated: `_fuse` issues 9 separate
`.at[flat].add` calls with ONE shared (N*K,) duplicate-index set into the
(T*M,)-row atlas, and `extract_surfels` one 15-channel scatter into the
surfel hash grid. XLA TPU lowers duplicate-index scatters to serialized
update loops, so update COUNT (not payload width) sets the cost — if true,
packing all fuse channels into one 29-wide scatter should be ~9x cheaper
than 9 narrow ones, and a MXU binning matmul (one-hot blocks) may beat both.

Usage: python -m gcslam_tpu.tools.microbench_scatter [--cpu] [--reps 20]
Prints one JSON line per strategy: {name, ms, checksum}.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args(argv)

    import os

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from gcslam_tpu.utils.profiling import force_sync_timing

    force_sync_timing()

    # Production fuse shapes: N*K = (1024 surfels + 512 feats) * K_ASSOC 8,
    # target space T*M = 128 * 2048 and pool space P = 7 * 1024.
    NU = 12288
    TM = 128 * 2048
    P = 7 * 1024
    D = 29

    rng = np.random.default_rng(0)
    # realistic collision structure: targets concentrated on ~2k live rows
    idx_tm = jnp.asarray(
        rng.choice(rng.choice(TM, size=2048, replace=False), size=NU), dtype=jnp.int32
    )
    idx_p = jnp.asarray(rng.integers(0, P, size=NU), dtype=jnp.int32)
    payload = jnp.asarray(rng.standard_normal((NU, D)), dtype=jnp.float32)

    def timed(name, fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        chk = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        t0 = time.time()
        for _ in range(args.reps):
            out = f(*xs)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ms = (time.time() - t0) / args.reps * 1000.0
        print(json.dumps({"name": name, "ms": round(ms, 3), "checksum": round(chk, 3)}))

    # 1. nine narrow scatters, shared duplicate indices (current _fuse shape)
    def nine_scatters(idx, pay):
        outs = []
        widths = [9, 3, 9, 1, 1, 1, 3, 1, 1]
        o = 0
        for w in widths:
            buf = jnp.zeros((TM, w), dtype=jnp.float32)
            outs.append(buf.at[idx].add(pay[:, o:o + w], mode="drop"))
            o += w
        return sum(jnp.sum(x) for x in outs)

    timed("nine_narrow_scatters_TM", nine_scatters, idx_tm, payload)

    # 2. one packed 29-wide scatter into T*M
    def one_scatter(idx, pay):
        return jnp.zeros((TM, D), dtype=jnp.float32).at[idx].add(pay, mode="drop")

    timed("one_packed_scatter_TM", one_scatter, idx_tm, payload)

    # 3. one packed scatter into the POOL space (small target)
    def one_scatter_pool(idx, pay):
        return jnp.zeros((P, D), dtype=jnp.float32).at[idx].add(pay, mode="drop")

    timed("one_packed_scatter_pool", one_scatter_pool, idx_p, payload)

    # 4. MXU binning: blocked one-hot matmul into the pool space
    def binned_matmul(idx, pay):
        B = 2048
        acc = jnp.zeros((P, D), dtype=jnp.float32)
        rows = jnp.arange(P, dtype=jnp.int32)
        for s in range(0, NU, B):
            one = (idx[s:s + B][None, :] == rows[:, None]).astype(jnp.float32)
            acc = acc + one @ pay[s:s + B]
        return acc

    timed("binned_matmul_pool", binned_matmul, idx_p, payload)

    # 5. sort + unique-run segment trick: sorted scatter
    def sorted_scatter(idx, pay):
        order = jnp.argsort(idx)
        return (
            jnp.zeros((TM, D), dtype=jnp.float32)
            .at[idx[order]].add(pay[order], mode="drop")
        )

    timed("sorted_packed_scatter_TM", sorted_scatter, idx_tm, payload)

    # 6. surfel-moment shape: 8192 updates, 15 channels, 8193 cells
    NS, CS, DS = 8192, 8193, 15
    idx_s = jnp.asarray(rng.integers(0, 1500, size=NS), dtype=jnp.int32)
    pay_s = jnp.asarray(rng.standard_normal((NS, DS)), dtype=jnp.float32)

    def surfel_scatter(idx, pay):
        return jnp.zeros((CS, DS), dtype=jnp.float32).at[idx].add(pay)

    timed("surfel_moment_scatter", surfel_scatter, idx_s, pay_s)

    def surfel_matmul(idx, pay):
        B = 2048
        acc = jnp.zeros((CS, DS), dtype=jnp.float32)
        rows = jnp.arange(CS, dtype=jnp.int32)
        for s in range(0, NS, B):
            one = (idx[s:s + B][None, :] == rows[:, None]).astype(jnp.float32)
            acc = acc + one @ pay[s:s + B]
        return acc

    timed("surfel_moment_matmul", surfel_matmul, idx_s, pay_s)

    print(json.dumps({"device": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
