#!/usr/bin/env python
"""One-shot device probe: the checkpoint writer's single-transfer pack
(`train/checkpoint._to_host`) roundtripped THROUGH THE REAL TPU
(docs/DEVICE_TODO.md #5).

Since the advisor fix the pack container is int32 (float leaves bitcast
in), so no FTZ/NaN canonicalization can corrupt integer optimizer state —
but the roundtrip had only ever run on the CPU platform. This checks
bit-equality on device for int leaves whose bit patterns alias f32
denormals (1..8), bools, f32 incl. nan/inf/-0.0/denormal, and bf16.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tumseg.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tumseg.train.checkpoint import _to_host


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    host_tree = {
        "step": np.asarray(3, np.int32),
        "denormal_ints": np.arange(1, 9, dtype=np.int32),
        "flags": np.asarray([True, False, True]),
        "w": rng.random((8, 128)).astype(np.float32),
        "wb": rng.random((8, 128)).astype(np.float32).astype(jnp.bfloat16),
        "specials": np.asarray([np.nan, np.inf, -0.0, 1e-45], np.float32),
    }
    dev_tree = jax.tree_util.tree_map(jnp.asarray, host_tree)
    got = _to_host(dev_tree)
    ok = True
    for k, a in host_tree.items():
        b = got[k]
        a = np.atleast_1d(np.asarray(a))
        b = np.atleast_1d(np.asarray(b))
        same = (a.dtype == b.dtype and a.shape == b.shape
                and np.array_equal(a.view(np.uint8), b.view(np.uint8)))
        print(f"{k}: dtype={b.dtype} bit-equal={bool(same)}")
        ok &= bool(same)
    print("ROUNDTRIP", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
