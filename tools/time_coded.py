"""End-to-end timing of the on-device-coded codec paths on the real TPU.

Run: PYTHONPATH=/root/.axon_site:. python tools/time_coded.py
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
    t = time.perf_counter()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    # trained-like symbol statistics (bench.py rationale)
    import flax

    p = dict(params)
    ga7 = p["params"]["g_a_7"]["conv"]
    ga7["kernel"] = ga7["kernel"] * 0.12
    ga7["bias"] = ga7["bias"] * 0.12
    params = p
    print(f"init {time.perf_counter()-t:.1f}s", flush=True)

    codec = WACNNCodec(model, params)
    codec.update()
    x = jax.random.uniform(jax.random.key(2), (B, H, W, 3), jnp.float32)

    import sys

    lane_sweep = [int(v) for v in sys.argv[1:]] or [128, 256, 512, 1024]
    for lanes in lane_sweep:
        codec.coded_lanes = lanes
        t = time.perf_counter()
        out = codec.compress_coded(x)
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.asarray(rec["x_hat"][:1, :1, :1])
        compile_s = time.perf_counter() - t
        nbytes = sum(len(s) for s in out["strings"][0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = codec.compress_coded(x)
            t1 = time.perf_counter()
            rec = codec.decompress_coded(out["strings"], out["shape"])
            np.asarray(rec["x_hat"][:1, :1, :1])  # force real sync (fetch)
            t2 = time.perf_counter()
            best = min(best, t2 - t0)
            print(
                f"L={lanes:5d} enc {(t1-t0)/B*1e3:7.2f}  dec {(t2-t1)/B*1e3:7.2f}"
                f"  total {(t2-t0)/B*1e3:7.2f} ms/img   "
                f"bpp {nbytes*8/(B*H*W):.3f}  (compile {compile_s:.0f}s)",
                flush=True,
            )

    ok = codec.selftest_coded(x[:2])
    print(f"selftest_coded(2 imgs): {ok}", flush=True)


if __name__ == "__main__":
    main()
