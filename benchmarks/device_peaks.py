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


def _scan_med(step_fn, carry0, probe, steps=STEPS, repeats=REPEATS):
    """`probe(final_carry)` must return a SCALAR: on the tunnelled axon
    backend block_until_ready returns at enqueue time, so the only
    reliable sync is a host fetch of (a scalar element of) the result."""
    def scan_of(length):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c0,
                                None, length=length)
            return probe(c)
        return lambda: float(run(carry0))

    med, est = differenced_median(scan_of(steps), scan_of(2 * steps),
                                  steps, repeats)
    q = np.percentile(est, [25, 75])
    return med, (float(q[0]), float(q[1]))


def mxu_peak(dtype, n, precision=None, steps=None):
    """precision=None measures jnp.dot DEFAULT precision -- on TPU that
    lowers f32 operands to single-pass bf16 MXU matmuls, which is what
    every production matmul in this framework actually runs;
    Precision.HIGHEST measures the multi-pass f32-accurate rate."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(n, n)), dtype)
    B = jnp.asarray(rng.normal(size=(n, n)), dtype)

    def step(c):
        A, B = c
        C = jnp.dot(A, B, preferred_element_type=jnp.float32,
                    precision=precision)
        # fold the product back so nothing hoists; cast keeps dtype
        return ((A + 1e-12 * C.astype(jnp.float32)).astype(dtype), B)

    steps = steps or STEPS
    med, iqr = _scan_med(step, (A, B), lambda c: c[0][0, 0], steps=steps)
    flops = 2.0 * n ** 3
    return {"n": n, "precision": str(precision or "default"),
            "s_per_iter": med, "iqr_s": iqr,
            "differenced_work_s": round(med * steps, 3),
            "reliable": bool(med > 0 and med * steps > 0.05),
            "tflops": round(flops / med / 1e12, 2)}


def hbm_peak(m):
    x = jnp.zeros((m,), jnp.float32)

    def step(c):
        return c + 1.0

    med, iqr = _scan_med(step, x, lambda c: c[0])
    by = 2.0 * 4.0 * m          # read + write
    return {"elements": m, "s_per_iter": med, "iqr_s": iqr,
            "differenced_work_s": round(med * STEPS, 3),
            "reliable": bool(med > 0 and med * STEPS > 0.05),
            "gbps": round(by / med / 1e9, 1)}


def transc_peak(op, m, k1, k2, steps=None):
    x = jnp.full((m,), 0.7, jnp.float32)
    fn = {"cos": jnp.cos, "exp": lambda v: jnp.exp(-v * v)}[op]

    def step_of(k):
        def step(c):
            for _ in range(k):
                c = fn(c)
            return c
        return step

    steps = steps or STEPS
    t1, _ = _scan_med(step_of(k1), x, lambda c: c[0], steps=steps)
    t2, iqr = _scan_med(step_of(k2), x, lambda c: c[0], steps=steps)
    per = (t2 - t1) / ((k2 - k1) * m)     # seconds per transcendental
    return {"elements": m, "k1": k1, "k2": k2,
            "t_k1_s": t1, "t_k2_s": t2, "iqr_k2_s": iqr,
            "differenced_work_s": round((t2 - t1) * steps, 3),
            "reliable": bool(per > 0 and (t2 - t1) * steps > 0.05),
            "gtransc_per_s": round(1.0 / per / 1e9, 2)}


def transc_sincos_pallas(m_rows, m_cols, k1, k2, steps=None):
    """Mosaic chained cos+sin of the SAME argument -- the production
    measure kernel's exact pattern (cos(p), sin(p) share range
    reduction, so two 'transcendentals' cost much less than 2x a lone
    cos).  Rate counts 2 transc per element per chain link."""
    import functools

    from jax.experimental import pallas as pl

    x = jnp.full((m_rows, m_cols), 0.7, jnp.float32)
    # smaller blocks than the cos chain: cos+sin keeps 3 (rows, cols)
    # temporaries live and 256-row blocks blow the 16 MB scoped-vmem cap
    rows_blk = max(8, m_rows // 64)

    def kern(x_ref, o_ref, *, k):
        v = x_ref[:]
        for _ in range(k):
            v = jnp.cos(v) + 0.5 * jnp.sin(v)
        o_ref[:] = v

    def step_of(k):
        call = pl.pallas_call(
            functools.partial(kern, k=k),
            grid=(m_rows // rows_blk,),
            in_specs=[pl.BlockSpec((rows_blk, m_cols),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows_blk, m_cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m_rows, m_cols),
                                           jnp.float32),
            interpret=SMOKE,
        )
        return lambda c: call(c)

    steps = steps or STEPS
    t1, _ = _scan_med(step_of(k1), x, lambda c: c[0, 0], steps=steps)
    t2, iqr = _scan_med(step_of(k2), x, lambda c: c[0, 0], steps=steps)
    m = m_rows * m_cols
    per = (t2 - t1) / (2.0 * (k2 - k1) * m)
    return {"elements": m, "k1": k1, "k2": k2,
            "t_k1_s": t1, "t_k2_s": t2, "iqr_k2_s": iqr,
            "differenced_work_s": round((t2 - t1) * steps, 3),
            "reliable": bool(per > 0 and (t2 - t1) * steps > 0.05),
            "gtransc_per_s": round(1.0 / per / 1e9, 2)}


def transc_cos_pallas(m_rows, m_cols, k1, k2, steps=None):
    """Mosaic-lowered chained cos: the production measure kernel
    (ops/pallas_kernels.py) computes its cos/sin inside Pallas, whose
    transcendental lowering is measurably faster than XLA's -- the
    honest ceiling for Pallas-kernel roofline rows."""
    import functools

    from jax.experimental import pallas as pl

    x = jnp.full((m_rows, m_cols), 0.7, jnp.float32)
    rows_blk = max(8, m_rows // 16)

    def kern(x_ref, o_ref, *, k):
        v = x_ref[:]
        for _ in range(k):
            v = jnp.cos(v)
        o_ref[:] = v

    def step_of(k):
        call = pl.pallas_call(
            functools.partial(kern, k=k),
            grid=(m_rows // rows_blk,),
            in_specs=[pl.BlockSpec((rows_blk, m_cols),
                                   lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows_blk, m_cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((m_rows, m_cols),
                                           jnp.float32),
            interpret=SMOKE,
        )
        return lambda c: call(c)

    steps = steps or STEPS
    t1, _ = _scan_med(step_of(k1), x, lambda c: c[0, 0], steps=steps)
    t2, iqr = _scan_med(step_of(k2), x, lambda c: c[0, 0], steps=steps)
    m = m_rows * m_cols
    per = (t2 - t1) / ((k2 - k1) * m)
    return {"elements": m, "k1": k1, "k2": k2,
            "t_k1_s": t1, "t_k2_s": t2, "iqr_k2_s": iqr,
            "differenced_work_s": round((t2 - t1) * steps, 3),
            "reliable": bool(per > 0 and (t2 - t1) * steps > 0.05),
            "gtransc_per_s": round(1.0 / per / 1e9, 2)}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PEAKS_r05.json"
    # sizes chosen so the differenced work is 100s of ms -- far above
    # the ~20-30 ms per-dispatch tunnel jitter that sank smaller runs
    n = 512 if SMOKE else 4096
    m_hbm = 1 << (20 if SMOKE else 28)     # 4 MB / 1 GB f32
    m_tr = 1 << (18 if SMOKE else 25)

    only = [s for s in os.environ.get("PK_ONLY", "").split(",") if s]
    prior = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)

    def want(name, fn):
        if only and name not in only:
            if name in prior:
                return prior[name]
            raise SystemExit(f"PK_ONLY set but no prior '{name}' in "
                             f"{out_path}")
        return fn()

    report = {
        "what": ("Measured per-chip ceilings (differenced-scan medians; "
                 "transcendental rate by chain-depth slope, which "
                 "cancels memory traffic).  Consumed by "
                 "benchmarks/roofline.py as ROOFLINE_PEAKS."),
        "device": str(jax.devices()[0]),
        "scan_steps": STEPS, "repeats": REPEATS,
        "mxu_default": want("mxu_default",
                            lambda: mxu_peak(jnp.float32, n)),
        "mxu_f32_highest": want("mxu_f32_highest", lambda: mxu_peak(
            jnp.float32, n, jax.lax.Precision.HIGHEST)),
        "mxu_bf16": want("mxu_bf16",
                         lambda: mxu_peak(jnp.bfloat16, n,
                                          steps=2 * STEPS)),
        "hbm": want("hbm", lambda: hbm_peak(m_hbm)),
        "transc_cos": want("transc_cos",
                           lambda: transc_peak("cos", m_tr, 8, 32)),
        "transc_exp": want("transc_exp", lambda: transc_peak(
            "exp", m_tr, 8, 32, steps=4 * STEPS)),
        "transc_cos_pallas": want("transc_cos_pallas", lambda:
                                  transc_cos_pallas(
                                      64 if SMOKE else 4096,
                                      512 if SMOKE else 4096, 8, 32)),
        "transc_sincos_pallas": want("transc_sincos_pallas", lambda:
                                     transc_sincos_pallas(
                                         64 if SMOKE else 4096,
                                         512 if SMOKE else 4096, 8, 32)),
    }
    report["peaks"] = {
        # the production matmul ceiling: jnp.dot default precision
        # (f32 operands -> single-pass bf16 MXU on TPU)
        "f32_mxu_flops": report["mxu_default"]["tflops"] * 1e12,
        "f32_highest_mxu_flops":
            report["mxu_f32_highest"]["tflops"] * 1e12,
        "bf16_mxu_flops": report["mxu_bf16"]["tflops"] * 1e12,
        "hbm_bytes_per_s": report["hbm"]["gbps"] * 1e9,
        # the transcendental ceiling is the BEST measured lowering/
        # pattern (Mosaic beats XLA; the production kernels compute
        # cos+sin of one argument, which shares range reduction)
        "transc_per_s": max(
            report["transc_cos"]["gtransc_per_s"],
            report["transc_cos_pallas"]["gtransc_per_s"],
            report["transc_sincos_pallas"]["gtransc_per_s"]) * 1e9,
        "transc_xla_per_s":
            report["transc_cos"]["gtransc_per_s"] * 1e9,
        "provenance": "measured on this chip by benchmarks/device_peaks.py",
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
