"""Per-stage cost/latency attribution of the jitted scan step by config
deltas — the honest-timing complement to tools/profile_step (which profiles
ONE program): compile the step under a family of config variants that each
disable or shrink one stage, measure steady-state latency (sync-mode, real
executions) + XLA cost analysis, and report the deltas against the base.

In the one-program design there are no per-stage timers to read (everything
is fused into one XLA executable; host-side stage timing would require
breaking the program apart and paying dispatch per stage) — config-delta
attribution measures what each stage actually costs IN CONTEXT, including
whatever fusion XLA does across stage boundaries.

Variants (each independently toggles one knob off the production base):
  no_map        with_map=False          -> whole map branch + map update
  gn_1round     map_icp_iters=1         -> per-GN-round association/evidence
  full_pool     k_shortlist=0           -> shortlist vs full-pool cost tile
  no_merge      k_merge_pairs_tile=0    -> merge-reduce
  view_256      m_tile_view=256         -> view-size-proportional work
  tiles_32      atlas_max_tiles=32      -> atlas-size-proportional work

Usage:
  python -m gcslam_tpu.tools.attribute_step [--cpu] [--steps 10]
         [--points 8192] [--variants no_map,gn_1round,...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time

VARIANTS = {
    "no_map": {"with_map": False},
    "gn_1round": {"map_icp_iters": 1},
    "full_pool": {"k_shortlist": 0},
    "no_merge": {"k_merge_pairs_tile": 0},
    "view_256": {"m_tile_view": 256},
    "tiles_32": {"atlas_max_tiles": 32},
    # compile-time-budget variants: production fail-fast pins config budgets
    # to the compiled constants, so these rebuild the constants in a
    # SUBPROCESS via the sanctioned GCSLAM_* overrides (VERDICT r4 #8) and
    # measure there.
    "sinkhorn_10": {"_env": {"GCSLAM_K_SINKHORN": "10"}},
    "sinkhorn_20": {"_env": {"GCSLAM_K_SINKHORN": "20"}},
    "hyp_1": {"_env": {"GCSLAM_K_HYP": "1"}},
    "hyp_2": {"_env": {"GCSLAM_K_HYP": "2"}},
    "surfel_512": {"n_surfel": 512},
    "m_tile_1024": {"m_tile": 1024},
    "shortlist_16": {"k_shortlist": 16},
    "exact_shortlist": {"shortlist_recall": 1.0},
    "no_share": {"map_share_extraction": False, "map_gn_shared": False},
    "per_hyp_gn": {"map_gn_shared": False},  # scan_step forces xla sinkhorn under vmap
    "camera_on": {"with_camera": True},
    "insert_1": {"k_insert_tile": 1},
    "view_512": {"m_tile_view": 512},
    "gn_3rounds": {"map_icp_iters": 3},
}


def measure_replay(cfg, stacked, n_scans: int) -> dict:
    """Variant latency on the REPLAY program (lax.scan over the bag, donated
    carry) — the same program bench.py's headline measures. Per-step sync
    attribution (measure) includes per-dispatch RPC + missing carry aliasing;
    the replay deltas are the ones that move the headline number."""
    import jax
    from gcslam_tpu.models.scan_step import init_state
    from gcslam_tpu.models import runner

    state0 = init_state(cfg)
    fn = jax.jit(lambda s, b: runner.run_scan(s, b, cfg))

    def _read(x):
        # HONEST-TIMING: end every timed region with a real device->host
        # read. block_until_ready alone can return at enqueue time on the
        # remote-TPU runtime (the force_sync_timing side effect does not
        # reliably persist across many compilations in one process — observed
        # as a 22 ms/scan pipeline "measuring" 0.015 ms late in a variant
        # sweep). A host read cannot complete before the computation does.
        import numpy as _np

        return float(_np.asarray(x)[-1, 0])

    rep = {}
    t0 = time.time()
    state, out = fn(state0, stacked)
    _read(out.pose)
    rep["compile_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    state, out = fn(state0, stacked)
    _read(out.pose)
    rep["ms_per_scan"] = round((time.time() - t0) / n_scans * 1000.0, 3)
    return rep


def measure(cfg, batches, steps: int) -> dict:
    import jax
    from gcslam_tpu.models.scan_step import init_state, scan_step

    state = init_state(cfg)
    fn = jax.jit(lambda s, b: scan_step(s, b, cfg))
    t0 = time.time()
    compiled = fn.lower(state, batches[0]).compile()
    t_compile = time.time() - t0

    rep = {"compile_s": round(t_compile, 1)}
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        rep["gflops"] = round(float(ca.get("flops", 0.0)) / 1e9, 3)
        rep["gbytes"] = round(
            float(ca.get("bytes accessed", ca.get("bytes_accessed", 0.0))) / 1e9, 4
        )
    except Exception:
        pass

    # Steady state: warm-up, then `steps` timed executions (state threads
    # through so the map grows realistically). Each step ends with a real
    # device->host scalar read: block_until_ready alone can return at
    # enqueue time on the remote-TPU runtime (see measure_replay), so the
    # read is what anchors the timestamp to actual completion. The read
    # itself costs one small RPC, reported separately as ms_read.
    import numpy as _np

    state, out = fn(state, batches[0])
    float(_np.asarray(out.pose)[0])
    t0 = time.time()
    for _ in range(5):
        float(_np.asarray(out.pose)[0])
    ms_read = (time.time() - t0) / 5 * 1e3
    rep["ms_read"] = round(ms_read, 3)
    times = []
    for i in range(steps):
        b = batches[1 + (i % (len(batches) - 1))]
        t0 = time.time()
        state, out = fn(state, b)
        float(_np.asarray(out.pose)[0])
        times.append(time.time() - t0)
    times.sort()
    n = len(times)
    rep["ms_p50"] = round(times[n // 2] * 1e3, 3)
    rep["ms_mean"] = round(sum(times) / n * 1e3, 3)
    return rep


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--points", type=int, default=8192)
    p.add_argument("--small", action="store_true", help="small map budgets (test mode)")
    p.add_argument("--replay", type=int, default=0, metavar="N",
                   help="measure the N-scan replay program (run_scan) per "
                        "variant instead of per-step sync dispatch")
    p.add_argument("--variants", default=",".join(VARIANTS),
                   help="comma list from: " + ",".join(VARIANTS))
    p.add_argument("--json", default=None, metavar="PATH")
    p.add_argument("--precision", default="f32", choices=["f32", "f64"],
                   help="belief-algebra dtype for the sweep. Default f32 — "
                        "production TPU precision (same as bench.py); a f64 "
                        "sweep spends hours in software-emulated compiles.")
    args = p.parse_args(argv)

    # The dtype binds when gcslam_tpu is first imported — which `python -m`
    # already did for the package __init__ BEFORE main() ran, so an env
    # setdefault here would be a silent no-op (advisor r3). Re-exec with the
    # env pinned when the effective dtype differs (same pattern as
    # eval/run.py); the effective dtype is also recorded in the output JSON.
    import os
    import sys as _sys

    want = "float32" if args.precision == "f32" else "float64"
    if os.environ.get("GCSLAM_BELIEF_DTYPE", "float64") != want:
        env = dict(os.environ, GCSLAM_BELIEF_DTYPE=want)
        os.execve(_sys.executable,
                  [_sys.executable, "-m", "gcslam_tpu.tools.attribute_step"]
                  + [a for a in (argv if argv is not None else _sys.argv[1:])],
                  env)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # Persistent compile cache (same dir as bench.py): re-runs of the sweep
    # skip recompiles of unchanged variants.
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import dataclasses
    import gcslam_tpu  # noqa: F401
    from gcslam_tpu.models.config import PipelineConfig
    from gcslam_tpu.frontend.synthetic import generate, SyntheticConfig
    from gcslam_tpu.utils.profiling import force_sync_timing

    force_sync_timing()

    base_kw = {}
    if args.small:
        base_kw = dict(atlas_max_tiles=16, m_tile=256, m_tile_view=128,
                       n_surfel=256, surfel_voxel_size_m=0.4)
    cfg0 = PipelineConfig(**base_kw)
    n_scans = args.replay if args.replay else max(args.steps + 1, 4)
    run = generate(SyntheticConfig(n_scans=n_scans,
                                   n_points=min(args.points, cfg0.n_points_cap)))
    if args.replay:
        from gcslam_tpu.models.scan_io import stack_scan_batches

        stacked = stack_scan_batches(run.batches)

        def measure_fn(cfg):
            return measure_replay(cfg, stacked, n_scans)
    else:
        def measure_fn(cfg):
            return measure(cfg, run.batches, args.steps)

    from gcslam_tpu.utils import xla as _xla

    out = {"device": jax.devices()[0].platform, "replay": args.replay,
           "belief_dtype": str(_xla.BELIEF_DTYPE.__name__),
           "base_budgets": {"atlas": f"{cfg0.atlas_max_tiles}x{cfg0.m_tile}",
                            "view": cfg0.m_tile_view, "k_shortlist": cfg0.k_shortlist,
                            "gn_rounds": cfg0.map_icp_iters}}
    out["base"] = measure_fn(cfg0)
    print("base", json.dumps(out["base"]), flush=True)

    key = "ms_per_scan" if args.replay else "ms_p50"
    for name in [v for v in args.variants.split(",") if v]:
        over = VARIANTS[name]
        if name == "view_256" and cfg0.m_tile_view <= 256:
            continue  # small mode: variant not meaningful
        if name == "tiles_32" and cfg0.atlas_max_tiles <= 32:
            continue
        if "_env" in over:
            # Compile-time budget: rebuild the constants in a subprocess
            # (base-only run) under the sanctioned GCSLAM_* override.
            import subprocess
            import tempfile

            with tempfile.NamedTemporaryFile("r", suffix=".json") as tf:
                sub_args = [_sys.executable, "-m",
                            "gcslam_tpu.tools.attribute_step",
                            "--variants", "", "--json", tf.name,
                            "--points", str(args.points),
                            "--steps", str(args.steps),
                            "--precision", args.precision]
                if args.replay:
                    sub_args += ["--replay", str(args.replay)]
                if args.cpu:
                    sub_args += ["--cpu"]
                if args.small:
                    sub_args += ["--small"]
                env = dict(os.environ, **over["_env"])
                r = subprocess.run(sub_args, env=env, capture_output=True,
                                   text=True)
                try:
                    sub = json.load(open(tf.name))
                    out[name] = sub["base"]
                    out[name]["delta_ms"] = round(
                        out["base"][key] - out[name][key], 3)
                except Exception:
                    out[name] = {"error": (r.stderr or r.stdout)[-200:]}
            print(name, json.dumps(out[name]), flush=True)
            continue
        cfg = dataclasses.replace(cfg0, **over)
        try:
            cfg.validate()
            out[name] = measure_fn(cfg)
            out[name]["delta_ms"] = round(out["base"][key] - out[name][key], 3)
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(name, json.dumps(out[name]), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return out


if __name__ == "__main__":
    main()
