"""On-chip A/B of the fused estimator-measure Pallas kernels.

Measures the general `psf_crop_diversity` against the symmetric-triple
`psf_crop_diversity_sym3` INSIDE a lax.scan (per-dispatch tunnel latency
is ~30 ms; naive loops measure dispatch, not the kernel — CLAUDE.md
kernel findings).  Run from /root/repo (axon plugin discovery).

    python benchmarks/kernel_variants.py [R] [B] [STEPS]
"""

from __future__ import annotations

import json
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
from mpc_sensorlessao_tpu.ops import dft, pallas_kernels as pk, psf, zernike  # noqa: E402


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    w = 31
    a = 3.0

    basis = zernike.make_basis(6, R)
    z4 = np.asarray(basis.stack[4], np.float32)
    pup = np.asarray(psf.pupil_mask_np(R), np.float32)
    rng = np.random.default_rng(0)
    phase = rng.normal(size=(B, R, R)).astype(np.float32) * 0.3
    div = np.stack([-a * z4, 0 * z4, a * z4]).astype(np.float32)
    dop = dft.centered_partial_dft(R, (w - 1) // 2)
    scale = 1.7e-3

    dev = jax.devices()[0]
    put = lambda x: jax.device_put(jnp.asarray(x), dev)
    phase_d, pup_d, dop_d = put(phase), put(pup), put(np.asarray(dop))
    dc, ds = put(np.cos(div)), put(np.sin(div))
    ca, sa = put(np.cos(a * z4)), put(np.sin(a * z4))

    def scanner(fn, n):
        @jax.jit
        def run(p0):
            def step(p, _):
                y = fn(p)
                # fold a scalar back in so successive steps differ and
                # nothing is hoisted out of the scan (scalar update --
                # no extra O(R^2) HBM traffic in the harness)
                s = jnp.sum(y)
                p = p * (1.0 + 1e-12 * s)
                return p, s
            _, ys = jax.lax.scan(step, p0, None, length=n)
            return ys
        return run

    variants = {
        "general": lambda p: pk.psf_crop_diversity(
            p, pup_d, dc, ds, dop_d, scale),
        "sym3": lambda p: pk.psf_crop_diversity_sym3(
            p, pup_d, ca, sa, dop_d, scale),
        "sym3_thin": lambda p: pk.psf_crop_diversity_sym3_thin(
            p, pup_d, ca, sa, dop_d, scale),
    }

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _timing import differenced_median

    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 9
    out = {"R": R, "B": B, "steps": steps, "repeats": repeats,
           "device": str(dev.device_kind)}
    ref = None

    for name, fn in variants.items():
        # the shared differenced-scan repeat-median protocol
        # (benchmarks/_timing.py): the difference cancels the 22-30 ms
        # per-dispatch tunnel latency, the median tames the ~2x
        # single-shot spread (KERNEL_r03 kernel_ab_late_round3)
        short = scanner(fn, steps)
        long = scanner(fn, 2 * steps)
        y = short(phase_d)
        y.block_until_ready()
        long(phase_d).block_until_ready()
        _, est = differenced_median(
            lambda: short(phase_d).block_until_ready(),
            lambda: long(phase_d).block_until_ready(),
            steps, repeats, warmed=True)
        est = est / B * 1e6
        out[name + "_us_per_scen"] = round(float(np.median(est)), 2)
        out[name + "_us_iqr"] = [round(float(np.percentile(est, 25)), 2),
                                 round(float(np.percentile(est, 75)), 2)]
        v = float(np.sum(np.asarray(y)))
        if ref is None:
            ref = v
        else:
            # per-variant key: a shared key would silently overwrite the
            # earlier variant's parity check
            out[name + "_rel_diff_vs_general"] = abs(v - ref) / abs(ref)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
