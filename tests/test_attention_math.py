"""Independent numpy verification of the window-attention math
(rel-pos bias indexing, scaling, softmax, projection) for both the WACNN
WindowAttention and the TCM WMSA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.nn import WindowAttention
from resdsic_tpu.nn.swin import WMSA


def _np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def test_window_attention_matches_numpy():
    ws, nh, c = 4, 2, 8
    n = ws * ws
    m = WindowAttention(dim=c, window_size=ws, num_heads=nh)
    x = np.random.default_rng(0).normal(size=(3, n, c)).astype(np.float32)
    params = m.init(jax.random.key(1), jnp.asarray(x))["params"]
    out = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    wqkv = np.asarray(params["qkv"]["kernel"])  # (C, 3C)
    bqkv = np.asarray(params["qkv"]["bias"])
    wproj = np.asarray(params["proj"]["kernel"])
    bproj = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["relative_position_bias_table"])  # ((2w-1)^2, nh)

    # relative position index (independent construction)
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    idx = (rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)

    hd = c // nh
    scale = hd**-0.5
    expected = np.empty_like(x)
    for b in range(x.shape[0]):
        qkv = x[b] @ wqkv + bqkv  # (n, 3c)
        q, k, v = np.split(qkv, 3, axis=-1)
        outs = []
        for h in range(nh):
            qh = q[:, h * hd : (h + 1) * hd] * scale
            kh = k[:, h * hd : (h + 1) * hd]
            vh = v[:, h * hd : (h + 1) * hd]
            attn = qh @ kh.T + table[idx, h]
            outs.append(_np_softmax(attn) @ vh)
        expected[b] = np.concatenate(outs, axis=-1) @ wproj + bproj

    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_wmsa_w_type_matches_numpy():
    ws, hd_dim, c = 4, 4, 8  # 2 heads
    m = WMSA(input_dim=c, output_dim=c, head_dim=hd_dim, window_size=ws, type="W")
    x = np.random.default_rng(2).normal(size=(1, ws, ws, c)).astype(np.float32)
    params = m.init(jax.random.key(3), jnp.asarray(x))["params"]
    out = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

    we = np.asarray(params["embedding_layer"]["kernel"])
    be = np.asarray(params["embedding_layer"]["bias"])
    wl = np.asarray(params["linear"]["kernel"])
    bl = np.asarray(params["linear"]["bias"])
    rel_params = np.asarray(params["relative_position_params"])  # (nh, 2w-1, 2w-1)

    nh = c // hd_dim
    n = ws * ws
    xi = x.reshape(n, c)
    qkv = xi @ we + be  # (n, 3c)
    # TCM layout: reshape (n, 3, nh, hd)
    qkv = qkv.reshape(n, 3, nh, hd_dim)
    cord = np.array([[i, j] for i in range(ws) for j in range(ws)])
    relation = cord[:, None, :] - cord[None, :, :] + ws - 1

    outs = np.empty((n, nh, hd_dim), np.float32)
    scale = hd_dim**-0.5
    for h in range(nh):
        q = qkv[:, 0, h] ; k = qkv[:, 1, h]; v = qkv[:, 2, h]
        sim = (q @ k.T) * scale + rel_params[h, relation[:, :, 0], relation[:, :, 1]]
        outs[:, h] = _np_softmax(sim) @ v
    expected = (outs.reshape(n, c) @ wl + bl).reshape(1, ws, ws, c)
    np.testing.assert_allclose(out, expected, atol=2e-5)


@pytest.mark.slow
def test_codec_selftests():
    """Public selftest() API on both codec drivers (tiny configs)."""
    from resdsic_tpu.models import (
        ResWACNNIndependentEntropy,
        ScalableCodec,
        WACNN,
        WACNNCodec,
    )

    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))

    m1 = WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
    p1 = m1.init({"params": jax.random.key(1), "noise": jax.random.key(2)}, x)
    c1 = WACNNCodec(m1, p1)
    c1.update()
    c1.selftest(x)

    m2 = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    p2 = m2.init({"params": jax.random.key(3), "noise": jax.random.key(4)}, x)
    c2 = ScalableCodec(m2, p2)
    c2.update()
    c2.selftest(x, quality=1)


def test_streaming_codec_matches_sequential():
    from resdsic_tpu.models import StreamingCodec, WACNN, WACNNCodec

    model = WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
    x0 = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = model.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x0
    )
    codec = WACNNCodec(model, params)
    codec.update()

    batches = [
        jax.random.uniform(jax.random.key(10 + i), (2, 64, 64, 3))
        for i in range(4)
    ]
    stream = StreamingCodec(codec, n_encode_workers=2, n_decode_workers=2)
    results = stream.map(batches)
    assert len(results) == 4

    for b, r in zip(batches, results):
        seq = codec.compress(b)
        assert [list(map(bytes, g)) for g in r["strings"]] == [
            list(map(bytes, g)) for g in seq["strings"]
        ]
        rec = codec.decompress(seq["strings"], seq["shape"])
        np.testing.assert_array_equal(
            np.asarray(r["x_hat"]), np.asarray(rec["x_hat"])
        )
