"""icd / imd / cicd / cimd variants: forward, mask-in-coding roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import (
    ConditionalScalableICD,
    ConditionalScalableIMD,
    ScalableCodec,
    ScalableICD,
    ScalableIMD,
    configure_model,
    models,
)

TINY = dict(N=64, M=64, num_slices=2, max_support_slices=1,
            lmbda_list=(0.0035, 0.065))


def _init(model):
    x = jnp.zeros((1, 64, 64, 3))
    return model.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )


def test_registry_complete():
    # reference keys plus the TCM family (unregistered/bit-rotted upstream)
    assert {"cnn", "ind", "icd", "imd", "cicd", "cimd"} <= set(models)
    assert {"tcm", "tcm_shared", "tcm_ind"} <= set(models)


def test_configure_model_from_args():
    import argparse

    ns = argparse.Namespace(
        model="cicd", N=64, M=64, lambda_list=[0.0035, 0.065],
        mask_policy="two-levels", lrp_prog=True, independent_lrp=False,
        multiple_decoder=False, joiner_policy="conditional",
    )
    m = configure_model(ns)
    assert isinstance(m, ConditionalScalableICD)
    assert m.joiner_policy == "conditional"


@pytest.mark.parametrize("policy", ["two-levels", "scalable_res", "point-based-std"])
def test_icd_mask_policies_forward(policy):
    q_levels = (0.0035, 0.01, 0.065) if policy == "scalable_res" else (0.0035, 0.065)
    model = ScalableICD(**{**TINY, "lmbda_list": q_levels}, mask_policy=policy)
    params = _init(model)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    quality = 0.5 if policy == "point-based-std" else 1
    out = model.apply(params, x, quality=quality, training=False)
    assert out["x_hat"].shape == (1, 1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out["x_hat"])))


@pytest.mark.slow
def test_icd_learnable_gamma_forward_and_grads():
    model = ScalableICD(
        **{**TINY, "lmbda_list": (0.0035, 0.01, 0.065)},
        mask_policy="learnable-mask-gamma",
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))

    def loss(p):
        out = model.apply(
            {"params": p}, x, quality=1, training=True,
            rngs={"noise": jax.random.key(3)},
        )
        return sum(-jnp.log2(l).sum() for l in out["likelihoods"].values())

    g = jax.grad(loss)(params["params"])
    # mask params receive gradient (mask participates in rate)
    gm = g["masking"]
    assert any(
        np.any(np.asarray(l) != 0) for l in jax.tree_util.tree_leaves(gm)
    )


@pytest.mark.slow
def test_icd_codec_roundtrip_with_mask():
    model = ScalableICD(**TINY, mask_policy="scalable_res")
    # scalable_res with 2 levels: q=1 is top level → all-ones; use 3 levels
    model = ScalableICD(
        **{**TINY, "lmbda_list": (0.0035, 0.01, 0.065)},
        mask_policy="scalable_res",
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
    codec = ScalableCodec(model, params)
    codec.update()

    out = codec.compress(x, quality=1, return_debug=True)
    rec = codec.decompress(out["strings"], out["shape"], quality=1, return_debug=True)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )
    # masked-out positions transmit zeros → prog stream smaller than full
    out_full = codec.compress(x, quality=2)
    bits_mid = sum(len(s) for sl in out["strings"][3] for s in sl)
    bits_full = sum(len(s) for sl in out_full["strings"][3] for s in sl)
    assert bits_mid < bits_full


def test_imd_dual_decoder():
    model = ScalableIMD(**TINY, mask_policy="two-levels")
    params = _init(model)
    assert "g_s_multi_0_0" in params["params"]
    assert "g_s_multi_1_0" in params["params"]
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    out = model.apply(params, x, training=False)
    assert out["x_hat"].shape == (2, 1, 64, 64, 3)


@pytest.mark.parametrize("joiner", ["conditional", "residual", "cac"])
def test_cicd_joiners(joiner):
    model = ConditionalScalableICD(
        **TINY, mask_policy="two-levels", joiner_policy=joiner
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    out = model.apply(params, x, quality=1, training=False)
    assert out["x_hat"].shape == (1, 1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out["x_hat"])))


@pytest.mark.slow
def test_cicd_conditional_codec_roundtrip():
    model = ConditionalScalableICD(
        **TINY, mask_policy="two-levels", joiner_policy="conditional"
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(7), (1, 64, 64, 3))
    codec = ScalableCodec(model, params)
    codec.update()
    out = codec.compress(x, quality=1, return_debug=True)
    rec = codec.decompress(out["strings"], out["shape"], quality=1, return_debug=True)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


@pytest.mark.slow
def test_cimd_concatenation_dual_decoder():
    model = ConditionalScalableIMD(
        **TINY, mask_policy="two-levels", joiner_policy="concatenation"
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(8), (1, 64, 64, 3))
    out = model.apply(params, x, training=False)
    assert out["x_hat"].shape == (2, 1, 64, 64, 3)
    # decoder 1 consumes 2M channels under concatenation
    codec = ScalableCodec(model, params)
    codec.update()
    enc = codec.compress(x, quality=1)
    rec = codec.decompress(enc["strings"], enc["shape"], quality=1)
    assert rec["x_hat"].shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_learnable_mask_nested_coding_roundtrip():
    model = ScalableICD(
        **{**TINY, "lmbda_list": (0.0035, 0.01, 0.065)},
        mask_policy="learnable-mask-nested",
    )
    params = _init(model)
    x = jax.random.uniform(jax.random.key(9), (1, 64, 64, 3))
    codec = ScalableCodec(model, params)
    codec.update()
    out = codec.compress(x, quality=1, return_debug=True)
    rec = codec.decompress(out["strings"], out["shape"], quality=1,
                           return_debug=True)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )
