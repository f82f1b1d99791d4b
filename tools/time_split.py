"""Time the significance-split coded path vs plain on the real TPU.

Run: PYTHONPATH=/root/.axon_site:. python tools/time_split.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.models import WACNN, WACNNCodec

B, H, W = 16, 768, 512


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = WACNN(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    p = dict(params)
    ga7 = p["params"]["g_a_7"]["conv"]
    ga7["kernel"] = ga7["kernel"] * 0.12
    ga7["bias"] = ga7["bias"] * 0.12
    codec = WACNNCodec(model, p)
    codec.update()
    codec.coded_lanes = 512
    x = jax.random.uniform(jax.random.key(2), (B, H, W, 3), jnp.float32)

    import sys

    configs = [
        ("split f=.25 cap=64", True, 0.25, 64),
        ("split f=.5", True, 0.5, None),
        ("plain", False, 0.5, None),
    ]
    for name, split, frac, wcap in configs:
        codec.coded_split = split
        codec.split_cap_frac = frac
        codec.coded_word_cap = wcap
        out = codec.compress_coded(x)
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.asarray(rec["x_hat"][:1, :1, :1])
        nbytes = sum(len(s) for s in out["strings"][0])
        for _ in range(3):
            t0 = time.perf_counter()
            out = codec.compress_coded(x)
            t1 = time.perf_counter()
            rec = codec.decompress_coded(out["strings"], out["shape"])
            np.asarray(rec["x_hat"][:1, :1, :1])
            t2 = time.perf_counter()
            print(
                f"{name:16s} enc {(t1-t0)/B*1e3:6.2f} "
                f"dec {(t2-t1)/B*1e3:6.2f} total {(t2-t0)/B*1e3:6.2f} ms/img "
                f"bpp {nbytes*8/(B*H*W):.3f}",
                flush=True,
            )
    codec.coded_split = True
    print("split selftest:", codec.selftest_coded(x[:2]), flush=True)


if __name__ == "__main__":
    main()
