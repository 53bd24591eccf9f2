#!/usr/bin/env python
"""FLOP count + MFU/roofline numbers for the BASELINE.md perf paragraph
(VERDICT r4 item 8).

Runs entirely on CPU: lowers the flagship forward at the bench shape
(B=32 x 4096 x 6, bf16) and reads XLA's cost analysis off the compiled
executable. Combined with the measured device time (bench.py) and the
breakdown.py per-op device times, this yields the honest MFU figure:

    MFU = analytic_flops / device_time / peak_flops

v5e peak: 197 TFLOP/s bf16 (394 with int8 — n/a), HBM BW 819 GB/s.

Usage: python benchmarks/roofline.py [--forward-ms 9.5]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

from tumseg.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBS = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--forward-ms", type=float, default=9.5,
                    help="measured device forward time at B=32x4096 bf16")
    ap.add_argument("--model", default="pointnet2_sem_seg")
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--N", type=int, default=4096)
    args = ap.parse_args()

    # XLA ops impl so cost analysis sees the REAL arithmetic (set before
    # tumseg import in case the dispatcher snapshots it)
    import os
    os.environ["TUMSEG_OPS_IMPL"] = "xla"

    from tumseg import models

    model = models.get_module(args.model)
    variables = model.init(jax.random.PRNGKey(0), 8, 0)

    def forward(variables, x):
        logp, _, _ = model.apply(variables, x, training=False,
                                 compute_dtype=jnp.bfloat16)
        return jnp.argmax(logp, axis=-1)

    x = jnp.asarray(np.random.default_rng(0).random((args.B, args.N, 6)),
                    dtype=jnp.float32)
    # Note: pallas custom calls are opaque to cost analysis (0 flops); the
    # XLA composition computes the same math (plus masking overhead), so
    # this is an upper bound on the kernels' useful flops.
    compiled = jax.jit(forward).lower(variables, x).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_moved = float(ca.get("bytes accessed", 0.0))
    t = args.forward_ms / 1e3
    pts = args.B * args.N
    print(f"model={args.model} shape=B{args.B}xN{args.N} bf16")
    print(f"analytic flops/fwd (XLA cost analysis, xla ops impl): "
          f"{flops:.3e} ({flops / pts:.0f} per point)")
    print(f"bytes accessed (CPU-lowering estimate): {bytes_moved:.3e}")
    print(f"at measured {args.forward_ms} ms: "
          f"{flops / t:.3e} FLOP/s = {flops / t / V5E_PEAK_BF16 * 100:.2f}% "
          f"of v5e bf16 peak (MFU)")
    print(f"roofline: compute-bound time {flops / V5E_PEAK_BF16 * 1e3:.3f} ms,"
          f" HBM-bound time {bytes_moved / V5E_HBM_GBS * 1e3:.3f} ms, "
          f"measured {args.forward_ms} ms")


if __name__ == "__main__":
    main()
