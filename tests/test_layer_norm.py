"""Pallas LayerNorm kernel tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.ops.layer_norm import layer_norm, layer_norm_reference


def test_pallas_ln_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((300, 768)), jnp.float32)  # pad path
    scale = jnp.asarray(rng.standard_normal(768), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(768), jnp.float32)
    a = layer_norm(x, scale, bias, impl="pallas")
    b = layer_norm_reference(x, scale, bias)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.heavy
def test_pallas_ln_grad_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    g1 = jax.grad(lambda x: layer_norm(x, scale, bias, impl="pallas").sum())(x)
    g2 = jax.grad(lambda x: layer_norm_reference(x, scale, bias).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_ln_3d_shapes():
    x = jnp.ones((2, 7, 128))
    out = layer_norm(x, jnp.ones(128), jnp.zeros(128), impl="pallas")
    assert out.shape == x.shape
