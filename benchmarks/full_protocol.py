"""The full reference experimental protocol, end to end.

Reproduces the reference's complete workflow at its real scale
(README.md:36-37,112-115,339): 2000 frames at 200 Hz (1000 train /
500 valid / 500 test), VAR(2) identification with held-out validation
RMSE/RRMSE, then the 500-step closed-loop MPC run -- plus a Monte-Carlo
batch of noise realizations, which the reference cannot do at all.

Usage: python benchmarks/full_protocol.py [resolution] [batch]
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    import mpc_sensorlessao_tpu  # noqa: F401  (installed package)
except ImportError:  # source checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
from mpc_sensorlessao_tpu.models import pipeline, var                # noqa
from mpc_sensorlessao_tpu.parallel import montecarlo                 # noqa
from mpc_sensorlessao_tpu.utils import guards, metrics               # noqa
from mpc_sensorlessao_tpu.utils.config import reference_config       # noqa


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = reference_config(resolution=res)   # full 1000/500/500 protocol

    t0 = time.time()
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(system.loop.est.A_s)
    t_build = time.time() - t0

    # VAR validation on the held-out window (README.md:134-155)
    states = system.coeff_series[:, 1:]
    _, rmse, rrmse = var.validate(
        system.var_model, states[cfg.sim.n_train - cfg.mpc.var_order:])

    # 500-step closed loop, Monte-Carlo over noise realizations
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), batch)
    t0 = time.time()
    out = montecarlo.run_batch(system.loop, system.layers, cfg, scen,
                               n_steps=cfg.sim.n_test)
    jax.block_until_ready(out.rms_res)
    t_loop = time.time() - t0

    summary = metrics.to_dict(metrics.summarize(out))
    health = guards.check_outputs(out, u_max=cfg.mpc.u_max)
    report = {
        "resolution": res,
        "batch": batch,
        "n_steps": cfg.sim.n_test,
        "build_s": round(t_build, 1),
        "loop_s": round(t_loop, 2),
        "solves_per_s": round(batch * cfg.sim.n_test / t_loop, 1),
        "var_rmse_mean": float(jnp.mean(rmse)),
        "var_rrmse_mean": float(jnp.mean(rrmse)),
        "health": str(health),
        **{k: round(v, 4) for k, v in summary.items()},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
