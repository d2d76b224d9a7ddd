"""Microbatch gradient accumulation (train/accum.py): the scanned
mean-of-means step must reproduce the full-batch value_and_grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.train.accum import microbatched_value_and_grad, pick_microbatch


def _loss_fn(params, x, labels):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    logits = h @ params["w2"]
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))


def _setup(b=32, d=16, h=24, c=5, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w1": jnp.asarray(rng.standard_normal((d, h)) * 0.3, jnp.float32),
        "b1": jnp.zeros((h,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((h, c)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, (b,)), jnp.int32)
    return params, x, labels


@pytest.mark.parametrize("micro", [4, 8, 16])
def test_matches_full_batch_grads(micro):
    params, x, labels = _setup()
    loss_f, grads_f = jax.value_and_grad(_loss_fn)(params, x, labels)
    loss_m, grads_m = jax.jit(
        microbatched_value_and_grad(_loss_fn, micro))(params, x, labels)
    np.testing.assert_allclose(loss_m, loss_f, rtol=2e-6)
    for k in grads_f:
        np.testing.assert_allclose(grads_m[k], grads_f[k], rtol=5e-5,
                                   atol=1e-7, err_msg=k)


def test_microbatch_ge_batch_is_passthrough():
    params, x, labels = _setup(b=8)
    loss_f, grads_f = jax.value_and_grad(_loss_fn)(params, x, labels)
    loss_m, grads_m = microbatched_value_and_grad(_loss_fn, 64)(
        params, x, labels)
    assert float(loss_m) == float(loss_f)
    for k in grads_f:
        np.testing.assert_array_equal(grads_m[k], grads_f[k])


def test_indivisible_batch_asserts():
    params, x, labels = _setup(b=12)
    with pytest.raises(AssertionError):
        microbatched_value_and_grad(_loss_fn, 8)(params, x, labels)


def test_pick_microbatch_vitb_shapes():
    # ViT-B/16: S=197, 3HD=2304, M=3072 bf16 -> 2.42 MB/img over the
    # wider (MLP) stash; the 256 MB/layer gate admits bs<=211, so bs512
    # splits to 128 (largest divisor that fits) while bs128 stays whole
    assert pick_microbatch(128, 197, 2304, 3072) == 128
    assert pick_microbatch(512, 197, 2304, 3072) == 128
    assert pick_microbatch(256, 197, 2304, 3072) == 128
    # tiny shapes never split
    assert pick_microbatch(8, 17, 96, 128) == 8


def test_scan_microbatched_under_jit_with_donation():
    # the bench step's exact composition: jitted, params donated, scan
    params, x, labels = _setup(b=32)
    _, grads_f = jax.value_and_grad(_loss_fn)(params, x, labels)

    @jax.jit
    def step(p, xx, ll):
        return microbatched_value_and_grad(_loss_fn, 8)(p, xx, ll)

    _, grads_m = step(params, x, labels)
    for k in grads_f:
        np.testing.assert_allclose(grads_m[k], grads_f[k], rtol=5e-5,
                                   atol=1e-7)
