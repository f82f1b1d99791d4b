import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import WACNN, WACNNCodec


@pytest.fixture(scope="module")
def small_model():
    """Tiny config: N=32, M=64, 4 slices of 16ch — same topology as default."""
    model = WACNN(N=32, M=64, num_slices=4, max_support_slices=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    return model, params


def test_forward_shapes_and_likelihoods(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    out = model.apply(params, x, training=True, rngs={"noise": jax.random.key(3)})
    assert out["x_hat"].shape == (2, 64, 64, 3)
    assert out["likelihoods"]["y"].shape == (2, 4, 4, 64)
    assert out["likelihoods"]["z"].shape == (2, 1, 1, 32)
    for lik in out["likelihoods"].values():
        arr = np.asarray(lik)
        assert np.all(arr > 0) and np.all(arr <= 1.0)


@pytest.mark.slow
def test_forward_jits_and_grads(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))

    @jax.jit
    def loss_fn(p, x, key):
        out = model.apply(p, x, training=True, rngs={"noise": key})
        mse = jnp.mean((out["x_hat"] - x) ** 2)
        bpp = sum(
            -jnp.log2(l).sum() for l in out["likelihoods"].values()
        ) / (64 * 64)
        return 0.01 * 255**2 * mse + bpp

    val, grads = jax.value_and_grad(loss_fn)(params, x, jax.random.key(4))
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # quantiles receive no gradient from the main loss (only via aux)
    nonzero = sum(bool(np.any(np.asarray(l) != 0)) for l in leaves)
    assert nonzero > len(leaves) * 0.5


@pytest.mark.slow
def test_real_codec_roundtrip_bitexact(small_model):
    """Decoder must rebuild the encoder's latent y_hat BIT-EXACTLY."""
    model, params = small_model
    x = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3))

    codec = WACNNCodec(model, params)
    codec.update()
    out = codec.compress(x, return_debug=True)
    assert len(out["strings"]) == 2
    assert len(out["strings"][0]) == 2 and len(out["strings"][1]) == 2
    assert out["shape"] == (1, 1)

    rec = codec.decompress(out["strings"], out["shape"], return_debug=True)
    x_hat = np.asarray(rec["x_hat"])
    assert x_hat.shape == (2, 64, 64, 3)

    # shared-executable design ⇒ bitwise identical latents enc vs dec
    np.testing.assert_array_equal(np.asarray(rec["y_hat"]), np.asarray(out["y_hat"]))

    # and the reconstruction closely matches the eval-mode forward pass
    # (forward is a separately-fused program: 1-ulp rounding flips possible,
    # so compare statistically, not bitwise)
    fwd = model.apply(params, x, training=False)
    fwd_hat = np.clip(np.asarray(fwd["x_hat"]), 0, 1)
    mismatch = np.mean(np.abs(x_hat - fwd_hat) > 1e-3)
    assert mismatch < 0.02, mismatch


def test_real_bpp_close_to_estimate(small_model):
    model, params = small_model
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))
    fwd = model.apply(params, x, training=False)
    est_bits = float(
        sum(-jnp.log2(l).sum() for l in fwd["likelihoods"].values())
    )

    codec = WACNNCodec(model, params)
    codec.update()
    out = codec.compress(x)
    real_bits = sum(len(s) * 8 for group in out["strings"] for s in group)
    # untrained model → broad distributions; allow 10% + overhead slack
    assert real_bits < est_bits * 1.10 + 256, (real_bits, est_bits)


def test_default_config_matches_reference_dims():
    model = WACNN()
    assert model.N == 192 and model.M == 320
    assert model.num_slices == 10 and model.max_support_slices == 5
    assert model.slice_ch == 32
    from resdsic_tpu.models.wacnn import _cc_widths, _hyper_widths

    assert _hyper_widths(320, 192) == [320, 288, 256, 224, 192]
    assert _cc_widths(320) == [224, 176, 128, 64]

def test_codec_roundtrip_with_rangecoder(small_model):
    """The 'rangecoder' registry entry drives the full codec end-to-end."""
    import resdsic_tpu as pkg

    model, params = small_model
    x = jax.random.uniform(jax.random.key(6), (1, 64, 64, 3))

    pkg.set_entropy_coder("rangecoder")
    try:
        codec = WACNNCodec(model, params)
        codec.update()
        out = codec.compress(x, return_debug=True)
        # host-path results carry the coder identity tag (ADVICE r2)
        assert out["coder"] == "rangecoder"
        rec = codec.decompress(
            out["strings"], out["shape"], return_debug=True,
            coder=out["coder"],
        )
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
        # decoding a rangecoder stream on an ans-bound codec must raise a
        # clear error instead of desyncing
        pkg.set_entropy_coder("ans")
        codec_ans = WACNNCodec(model, params)
        codec_ans.update()
        from resdsic_tpu.models.codec import CodedStreamError

        with pytest.raises(CodedStreamError, match="entropy coder"):
            codec_ans.decompress(
                out["strings"], out["shape"], coder=out["coder"]
            )
    finally:
        pkg.set_entropy_coder("ans")

def test_int8_saturation_counter(small_model):
    """encode_device reports clamp saturation; codec warns when nonzero."""
    import warnings
    from resdsic_tpu.models.codec import WACNNCodec as _C

    model, params = small_model
    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 3))
    out = model.apply(params, x, method="encode_device")
    assert "n_saturated" in out
    assert int(np.asarray(out["n_saturated"])) == 0  # sane at this scale

    with pytest.warns(RuntimeWarning, match="saturated the int8 clamp"):
        _C._warn_saturation({"n_saturated": np.int32(5)})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _C._warn_saturation({"n_saturated": np.int32(0)})  # no warning
