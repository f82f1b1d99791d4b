"""Stage ablation of the on-device-coded programs on the real TPU.

Isolates where encode_coded / decode_coded time goes by monkeypatching the
device_ans primitives with shape-preserving dummies (the model methods
import them locally, so patching the module attribute takes effect for a
freshly-traced jit):

  enc full       — production encode_coded
  enc no-scan    — ans_encode_packed -> trivial (keeps entry packing alive)
  enc no-compact — additionally compact_words_dense -> trivial
  enc no-select  — additionally rank_select/select_by_index -> trivial
  enc model      — encode_device (no coder at all)
  dec full       — production decode_coded
  dec no-scan    — decode plane scans -> zeros (keeps reconstruction alive)

Differences between adjacent rows give the stage costs. Timing is
fetch-synced, one dispatch in flight, median of 3.

Run: PYTHONPATH=/root/.axon_site:. python tools/ablate_coded_stages.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.coding import device_ans
from resdsic_tpu.models import WACNN, WACNNCodec

B, H, W = 16, 768, 512
LANES = 512
WORD_CAP = 64
SIDECAR = 512
REPS = 3


def timed(fn, sync):
    sync(fn())  # warm/compile
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def report(name, t):
    print(f"{name:16s} {t*1e3:8.1f} ms/batch  {t/B*1e3:6.2f} ms/img", flush=True)


def dummy_encode(pre, active=None):
    b, l, t = pre.shape
    states = jnp.full((b, l), 1 << 16, jnp.uint32) + (
        pre[:, :, 0] & 1
    ).astype(jnp.uint32)
    flags = (pre & 1).astype(jnp.bool_)
    return states, flags, pre & 0x7FFF


def dummy_compact(flags, words, cap):
    b, l, t = flags.shape
    dense = words.reshape(b * l, t)[:, :cap]
    counts = flags[:, :, 0].astype(jnp.int32)
    return dense, counts


def dummy_rank(flags, cap):
    b, l, t = flags.shape
    tidx = jnp.broadcast_to(
        jnp.arange(cap, dtype=jnp.int32) % t, (b, l, cap)
    ) + flags[:, :, :1].astype(jnp.int32)
    counts = jnp.minimum(flags[:, :, 0].astype(jnp.int32) + cap, cap)
    return jnp.minimum(tidx, t - 1), counts


def dummy_select(values, tidx):
    return values[:, :, : tidx.shape[-1]] + tidx[:, :, 0:1] * 0


def dummy_dec_plane(carry, idxs, tables, active=None):
    return carry, idxs * 0 + carry.states[:, :, None].astype(jnp.int32) % 3


def dummy_dec_bin(carry, p0):
    return carry, p0 * 0 + carry.states[:, :, None].astype(jnp.int32) % 2


def dummy_outliers(deltas, cap, seg=8192):
    b, n = deltas.shape
    pos = jnp.full((b, cap), n, jnp.int32) + deltas[:, :1].astype(jnp.int32) * 0
    dval = jnp.zeros((b, cap), jnp.int32)
    return pos, dval, jnp.zeros((b,), jnp.int32)


def dummy_pack(syms, idxs, tables):
    # shape/dtype-preserving, gather-free
    return jax.lax.bitcast_convert_type(
        (idxs.astype(jnp.uint32) << 16) | jnp.uint32(1), jnp.int32
    ) + syms * 0


def dummy_vtb(values, rows, tables, gc_only=False):
    return jnp.clip(values + 32, 0, 63)


def dummy_btv(bins, rows, tables, gc_only=False):
    return bins - 32


def dummy_rows_const(rows, consts):
    return rows * 0 + jnp.int32(32768)


REAL = {
    "ans_encode_packed": device_ans.ans_encode_packed,
    "compact_words_dense": device_ans.compact_words_dense,
    "rank_select": device_ans.rank_select,
    "select_by_index": device_ans.select_by_index,
    "ans_decode_plane": device_ans.ans_decode_plane,
    "ans_decode_binary_plane": device_ans.ans_decode_binary_plane,
    "collect_outliers": device_ans.collect_outliers,
    "pack_table_entries": device_ans.pack_table_entries,
    "values_to_bins": device_ans.values_to_bins,
    "bins_to_values": device_ans.bins_to_values,
    "map_rows_const": device_ans.map_rows_const,
}


def patched(patches):
    for k in REAL:
        setattr(device_ans, k, patches.get(k, REAL[k]))


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
    codec.coded_lanes = LANES
    codec.coded_split = True
    codec.split_cap_frac = 0.25
    codec.coded_word_cap = WORD_CAP
    x = jax.random.uniform(jax.random.key(2), (B, H, W, 3), jnp.float32)
    capv = codec._split_capv(x)

    def enc_variant(name, patches):
        patched(patches)
        try:
            fn = jax.jit(
                functools.partial(model.apply, method="encode_coded"),
                static_argnames=(
                    "lanes", "cap", "split_consts", "split_capv",
                    "sidecar_cap",
                ),
            )
            t = timed(
                lambda: fn(
                    codec.params, x, codec.dev_tables, lanes=LANES,
                    cap=WORD_CAP, split_tables=codec.split_tables,
                    split_consts=codec._split_consts, split_capv=capv,
                    sidecar_cap=SIDECAR,
                ),
                lambda o: np.asarray(o["counts"][:1, :1]),
            )
            report(name, t)
        finally:
            patched({})

    enc_variant("enc full", {})
    enc_variant("enc no-scan", {"ans_encode_packed": dummy_encode})
    enc_variant(
        "enc no-compact",
        {"ans_encode_packed": dummy_encode,
         "compact_words_dense": dummy_compact},
    )
    enc_variant(
        "enc no-select",
        {"ans_encode_packed": dummy_encode,
         "compact_words_dense": dummy_compact,
         "rank_select": dummy_rank,
         "select_by_index": dummy_select},
    )
    enc_variant("enc no-outliers", {"collect_outliers": dummy_outliers})
    enc_variant("enc no-entrypack", {"pack_table_entries": dummy_pack})
    enc_variant(
        "enc no-binmap",
        {"values_to_bins": dummy_vtb, "bins_to_values": dummy_btv},
    )
    enc_variant("enc no-rowsconst", {"map_rows_const": dummy_rows_const})

    t = timed(
        lambda: codec._encode_fn(codec.params, x),
        lambda o: np.asarray(o["n_saturated"]),
    )
    report("enc model only", t)

    # --- decode ablations on a real container ---
    out = codec.compress_coded(x)
    assert out.get("format") == "device-ans", out.get("format")
    hdr = codec._parse_blobs(out["strings"][0])
    counts, states, flat = hdr["counts"], hdr["states"], hdr["flat"]
    padded = np.zeros(codec._bucket(len(flat)), np.uint16)
    padded[: len(flat)] = flat
    c = getattr(model, "hyper_ch", None) or model.N
    z_shape = (B, H // 64, W // 64, c)
    cap = codec._bucket(int(counts.max()), lo=32)
    skw = {}
    if hdr["sidecar"] is not None:
        skw["outlier_pos"] = jnp.asarray(hdr["sidecar"][0])
        skw["outlier_delta"] = jnp.asarray(hdr["sidecar"][1])

    def dec_variant(name, patches):
        patched(patches)
        try:
            fn = jax.jit(
                functools.partial(model.apply, method="decode_coded"),
                static_argnames=(
                    "z_shape", "lanes", "cap", "split_consts", "split_capv",
                ),
            )
            t = timed(
                lambda: fn(
                    codec.params, jnp.asarray(padded), jnp.asarray(counts),
                    jnp.asarray(states), codec.dev_tables, z_shape=z_shape,
                    lanes=LANES, cap=cap,
                    split_tables=codec.split_tables,
                    split_consts=codec._split_consts, split_capv=capv,
                    **skw,
                ),
                lambda o: np.asarray(o[0][:1, :1, :1]),
            )
            report(name, t)
        finally:
            patched({})

    dec_variant("dec full", {})
    dec_variant(
        "dec no-scan",
        {"ans_decode_plane": dummy_dec_plane,
         "ans_decode_binary_plane": dummy_dec_bin},
    )


if __name__ == "__main__":
    main()
