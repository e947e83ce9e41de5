"""Measured device ceilings for the roofline (VERDICT r4 #2).

The r4 roofline normalized against datasheet/estimated peaks
(`vpu_flops_ESTIMATE`, a 6-op transcendental equivalent) and one row
read an impossible 106% of HBM peak.  This measures the actual ceilings
of THIS chip with the same differenced-scan median protocol the kernel
timings use (benchmarks/_timing.py):

  mxu_f32 / mxu_bf16   dense (N, N) @ (N, N) matmul sustained FLOP/s
  hbm                  x <- x + 1 streaming read+write bytes/s
  transc_cos / _exp    chained elementwise cos / exp, SLOPE method:
                       rate = (k2 - k1) * M / (t_k2 - t_k1) -- the
                       difference in chain depth cancels the memory
                       traffic and fixed overhead entirely, giving pure
                       transcendental ops/s (no op-equivalent guess).

Writes PEAKS_r05.json; benchmarks/roofline.py consumes it via
ROOFLINE_PEAKS to normalize utilizations against measured ceilings.

Usage: python benchmarks/device_peaks.py [out.json]
Env:   PK_CPU=1 (smoke)  PK_STEPS=10  PK_REPEATS=9
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

try:
    import mpc_sensorlessao_tpu  # noqa: F401  (installed package)
except ImportError:  # source checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mpcsao_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
if os.environ.get("PK_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from _timing import differenced_median  # noqa: E402

STEPS = int(os.environ.get("PK_STEPS", "64"))
REPEATS = int(os.environ.get("PK_REPEATS", "7"))
SMOKE = bool(os.environ.get("PK_CPU"))


def _scan_med(step_fn, carry0, steps=STEPS, repeats=REPEATS):
    def scan_of(length):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c0,
                                None, length=length)
            return c
        return lambda: jax.block_until_ready(run(carry0))

    med, est = differenced_median(scan_of(steps), scan_of(2 * steps),
                                  steps, repeats)
    q = np.percentile(est, [25, 75])
    return med, (float(q[0]), float(q[1]))


def mxu_peak(dtype, n):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(n, n)), dtype)
    B = jnp.asarray(rng.normal(size=(n, n)), dtype)

    def step(c):
        A, B = c
        C = jnp.dot(A, B, preferred_element_type=jnp.float32)
        # fold the product back so nothing hoists; cast keeps dtype
        return ((A + 1e-12 * C.astype(jnp.float32)).astype(dtype), B)

    med, iqr = _scan_med(step, (A, B))
    flops = 2.0 * n ** 3
    return {"n": n, "s_per_iter": med, "iqr_s": iqr,
            "differenced_work_s": round(med * STEPS, 3),
            "reliable": bool(med > 0 and med * STEPS > 0.05),
            "tflops": round(flops / med / 1e12, 2)}


def hbm_peak(m):
    x = jnp.zeros((m,), jnp.float32)

    def step(c):
        return c + 1.0

    med, iqr = _scan_med(step, x)
    by = 2.0 * 4.0 * m          # read + write
    return {"elements": m, "s_per_iter": med, "iqr_s": iqr,
            "differenced_work_s": round(med * STEPS, 3),
            "reliable": bool(med > 0 and med * STEPS > 0.05),
            "gbps": round(by / med / 1e9, 1)}


def transc_peak(op, m, k1, k2):
    x = jnp.full((m,), 0.7, jnp.float32)
    fn = {"cos": jnp.cos, "exp": lambda v: jnp.exp(-v * v)}[op]

    def step_of(k):
        def step(c):
            for _ in range(k):
                c = fn(c)
            return c
        return step

    t1, _ = _scan_med(step_of(k1), x)
    t2, iqr = _scan_med(step_of(k2), x)
    per = (t2 - t1) / ((k2 - k1) * m)     # seconds per transcendental
    return {"elements": m, "k1": k1, "k2": k2,
            "t_k1_s": t1, "t_k2_s": t2, "iqr_k2_s": iqr,
            "differenced_work_s": round((t2 - t1) * STEPS, 3),
            "reliable": bool(per > 0 and (t2 - t1) * STEPS > 0.05),
            "gtransc_per_s": round(1.0 / per / 1e9, 2)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PEAKS_r05.json"
    # sizes chosen so the differenced work is 100s of ms -- far above
    # the ~20-30 ms per-dispatch tunnel jitter that sank smaller runs
    n = 512 if SMOKE else 8192
    m_hbm = 1 << (20 if SMOKE else 28)     # 4 MB / 1 GB f32
    m_tr = 1 << (18 if SMOKE else 25)

    report = {
        "what": ("Measured per-chip ceilings (differenced-scan medians; "
                 "transcendental rate by chain-depth slope, which "
                 "cancels memory traffic).  Consumed by "
                 "benchmarks/roofline.py as ROOFLINE_PEAKS."),
        "device": str(jax.devices()[0]),
        "scan_steps": STEPS, "repeats": REPEATS,
        "mxu_f32": mxu_peak(jnp.float32, n),
        "mxu_bf16": mxu_peak(jnp.bfloat16, n),
        "hbm": hbm_peak(m_hbm),
        "transc_cos": transc_peak("cos", m_tr, 8, 32),
        "transc_exp": transc_peak("exp", m_tr, 8, 32),
    }
    report["peaks"] = {
        "f32_mxu_flops": report["mxu_f32"]["tflops"] * 1e12,
        "bf16_mxu_flops": report["mxu_bf16"]["tflops"] * 1e12,
        "hbm_bytes_per_s": report["hbm"]["gbps"] * 1e9,
        "transc_per_s": report["transc_cos"]["gtransc_per_s"] * 1e9,
        "provenance": "measured on this chip by benchmarks/device_peaks.py",
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
