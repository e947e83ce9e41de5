"""100k+ scenario Monte-Carlo closed loop on one chip (BASELINE config 5 scale).

BASELINE config 5 asks for "100k+ scenario rollouts"; the multi-host
fabric is dryrun-validated (MULTIPROC/MULTICHIP artifacts), and the
single-chip shared-window path is fast enough to run the full 100k-
scenario population outright: D/r0 x SNR grid x thousands of noise seeds
per cell, chunked so per-chunk telemetry stays modest, with ONLY
per-scenario settled summaries leaving the device.

Per (D/r0): one tuned build (the MMSE prior scale depends on d); the
scenario axis is SNR x seeds on the shared turbulence window.

Usage: python benchmarks/montecarlo_100k.py [resolution] [out.json]
Env:   MC1_DR0=5,10,15,20  MC1_SNR=5,10,20,40  MC1_REPS=6400
       MC1_STEPS=100  MC1_CHUNK=1600  MC1_CPU=1 (smoke)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpcsao_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
if os.environ.get("MC1_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mpc_sensorlessao_tpu.models import pipeline                   # noqa
from mpc_sensorlessao_tpu.parallel import montecarlo               # noqa
from mpc_sensorlessao_tpu.utils.config import (                    # noqa
    mag_conv, reference_config)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out_path = sys.argv[2] if len(sys.argv) > 2 else "MONTECARLO_r04.json"
    d_grid = [float(x) for x in
              os.environ.get("MC1_DR0", "5,10,15,20").split(",")]
    snr_grid = [float(x) for x in
                os.environ.get("MC1_SNR", "5,10,20,40").split(",")]
    reps = int(os.environ.get("MC1_REPS", "6400"))
    n_steps = int(os.environ.get("MC1_STEPS", "100"))
    chunk_reps = int(os.environ.get("MC1_CHUNK", "1600"))
    assert reps % chunk_reps == 0

    n_total = len(d_grid) * len(snr_grid) * reps
    report = {
        "what": (f"{n_total} closed-loop scenarios x {n_steps} steps on "
                 "one chip: per-cell mean/p10 settled Strehl, residual "
                 "RMS, divergence count; chunked shared-window batches, "
                 "only per-scenario settled summaries leave the device"),
        "resolution": res, "n_steps": n_steps, "reps_per_cell": reps,
        "n_scenarios": n_total, "device": str(jax.devices()[0]),
        "cells": {},
    }
    t_all = time.time()
    total_loop_s = 0.0

    for d in d_grid:
        cfg = reference_config(resolution=res)
        cfg = cfg.replace(
            zernike=dataclasses.replace(cfg.zernike, radial_order=10),
            mpc=dataclasses.replace(cfg.mpc, warm_start=True,
                                    var_ridge=1e-2, r_weight=30.0),
            estimator=dataclasses.replace(
                cfg.estimator, method="mmse",
                prior_scale=min(0.15, 0.5 / d)),
            sim=dataclasses.replace(cfg.sim, d_over_r0=d, n_train=300,
                                    n_valid=50, n_test=n_steps),
        )
        t0 = time.time()
        system = pipeline.build(cfg, jax.random.PRNGKey(0))
        jax.block_until_ready(system.loop.est.A_s)
        build_s = time.time() - t0
        start = float(cfg.sim.n_train + cfg.sim.n_valid)
        init_u = pipeline.warm_start_command(system, cfg, int(start))
        mag = float(mag_conv(d))
        # noise_scale per SNR cell: 10^((SNR_cfg - snr)/20)
        scales = np.asarray(
            [10.0 ** ((cfg.estimator.snr_db - s) / 20.0)
             for s in snr_grid], np.float32)
        B = len(snr_grid) * chunk_reps
        scale_col = np.repeat(scales, chunk_reps)
        settle = n_steps // 2

        @jax.jit
        def run_chunk(keys):
            def one(key, ns):
                out = pipeline.closed_loop.simulate(
                    system.loop, system.layers, cfg, key,
                    n_steps=n_steps, start_step=start, mag=mag,
                    noise_scale=ns, init_u=init_u)
                return (jnp.mean(out.strehl_exact[settle:]),
                        jnp.mean(out.rms_res[settle:]),
                        jnp.mean(out.rms_turb[settle:]))
            return jax.vmap(one)(keys, jnp.asarray(scale_col))

        # accumulate per-cell per-scenario settled summaries
        acc = {s: {"strehl": [], "rms": [], "turb": []} for s in snr_grid}
        t0 = time.time()
        for c in range(reps // chunk_reps):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(1), c), B)
            sx, rr, rt = run_chunk(keys)
            sx, rr, rt = (np.asarray(sx), np.asarray(rr), np.asarray(rt))
            for i, s in enumerate(snr_grid):
                sl = slice(i * chunk_reps, (i + 1) * chunk_reps)
                acc[s]["strehl"].append(sx[sl])
                acc[s]["rms"].append(rr[sl])
                acc[s]["turb"].append(rt[sl])
        jax.block_until_ready(sx)
        loop_s = time.time() - t0
        total_loop_s += loop_s

        for s in snr_grid:
            sx = np.concatenate(acc[s]["strehl"])
            rr = np.concatenate(acc[s]["rms"])
            rt = np.concatenate(acc[s]["turb"])
            finite = np.isfinite(rr) & np.isfinite(sx)
            diverged = (~finite) | (rr > 3.0 * rt)
            okv = sx[~diverged]
            cell = {"n": int(sx.size), "n_diverged": int(diverged.sum())}
            if okv.size:  # an all-diverged cell must not crash the
                # report after the full multi-minute chip run
                cell.update(
                    mean_strehl=round(float(okv.mean()), 4),
                    p10_strehl=round(float(np.percentile(okv, 10)), 4),
                    min_strehl=round(float(okv.min()), 4),
                    mean_rms_res=round(float(rr[~diverged].mean()), 4),
                    mean_rms_turb=round(float(rt[~diverged].mean()), 4),
                )
            report["cells"][f"d={d:g}_snr={s:g}"] = cell
        print(json.dumps({f"d={d:g}": {
            "build_s": round(build_s, 1), "loop_s": round(loop_s, 2),
            "steps_per_s": round(len(snr_grid) * reps * n_steps / loop_s,
                                 1)}}), file=sys.stderr, flush=True)

    report["total_loop_s"] = round(total_loop_s, 2)
    report["total_wall_s"] = round(time.time() - t_all, 1)
    report["aggregate_steps_per_s"] = round(
        n_total * n_steps / total_loop_s, 1)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
