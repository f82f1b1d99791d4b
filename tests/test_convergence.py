"""Convergence smoke test: training DECREASES the RD loss (ref purpose:
src/train.py:265-403 — the reference's whole job is training; two finite
steps prove plumbing, this proves learning)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import ResWACNNIndependentEntropy
from resdsic_tpu.training import (
    ScalableRateDistortionLoss,
    create_train_state,
    make_train_step,
)


def _structured_batch(key, n, hw=64):
    """Compressible synthetic images: blocky low-frequency content + noise."""
    k1, k2 = jax.random.split(key)
    small = jax.random.uniform(k1, (n, hw // 8, hw // 8, 3))
    imgs = jnp.kron(small, jnp.ones((1, 8, 8, 1)))
    imgs = imgs + 0.02 * jax.random.normal(k2, imgs.shape)
    return jnp.clip(imgs, 0.0, 1.0)


@pytest.mark.slow
def test_ind_training_converges_on_synthetic():
    model = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    x0 = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x0
    )
    state = create_train_state(params)
    crit = ScalableRateDistortionLoss(lmbda_list=[0.0035, 0.065])
    step = make_train_step(model, crit, donate=False)

    n_steps = 200
    losses, bpps = [], []
    data_keys = jax.random.split(jax.random.key(42), 8)  # 8-batch cycle
    for i in range(n_steps):
        xb = _structured_batch(data_keys[i % len(data_keys)], 4)
        state, metrics = step(
            state, xb, jax.random.key(1000 + i), 3e-4, 1e-3
        )
        losses.append(float(metrics["loss"]))
        bpps.append(float(metrics["bpp_loss"]))

    losses = np.asarray(losses)
    bpps = np.asarray(bpps)
    assert np.all(np.isfinite(losses))

    head = losses[5:55].mean()     # skip the first chaotic steps
    tail = losses[-50:].mean()
    assert tail < 0.6 * head, (head, tail)

    # rate must land below its starting point too (the entropy models and
    # the hyperprior have learned something, not just the MSE term)
    assert bpps[-50:].mean() < bpps[5:55].mean(), (
        bpps[5:55].mean(), bpps[-50:].mean()
    )

    # loss trend is broadly monotone: late quarter beats mid quarter
    mid = losses[n_steps // 2 : n_steps // 2 + 50].mean()
    assert tail <= mid * 1.05, (mid, tail)
