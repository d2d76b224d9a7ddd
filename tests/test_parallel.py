"""Parallelism tests on the 8-device CPU mesh: DP step wrapping, TP sharding
rules, dp+tp correctness vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from uml_tpu.core.meshes import MODEL_AXIS, create_mesh
from uml_tpu.parallel import (
    apply_tp_sharding,
    dp_shardings,
    infer_sharding_tree,
    make_dp_train_step,
)


def test_infer_sharding_tree_rules():
    params = {
        "transformer": {
            "resblocks_0": {
                "qkv": {"kernel": np.zeros((8, 24)), "bias": np.zeros(24)},
                "out_proj": {"kernel": np.zeros((8, 8)), "bias": np.zeros(8)},
                "c_fc": {"kernel": np.zeros((8, 32)), "bias": np.zeros(32)},
                "c_proj": {"kernel": np.zeros((32, 8)), "bias": np.zeros(8)},
                "ln_1": {"ln": {"scale": np.zeros(8), "bias": np.zeros(8)}},
            }
        },
        "head_w": np.zeros((8, 4)),
    }
    specs = infer_sharding_tree(params)
    blk = specs["transformer"]["resblocks_0"]
    assert blk["qkv"]["kernel"] == P(None, MODEL_AXIS)       # column
    assert blk["qkv"]["bias"] == P(MODEL_AXIS)
    assert blk["out_proj"]["kernel"] == P(MODEL_AXIS, None)  # row
    assert blk["out_proj"]["bias"] == P()
    assert blk["c_fc"]["kernel"] == P(None, MODEL_AXIS)
    assert blk["c_proj"]["kernel"] == P(MODEL_AXIS, None)
    assert blk["ln_1"]["ln"]["scale"] == P()
    assert specs["head_w"] == P()


def test_dp_train_step_matches_single_device():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    X = rng.standard_normal((16, 4)).astype(np.float32)
    y = (rng.integers(0, 3, 16)).astype(np.int64)
    tx = optax.sgd(0.1)

    def step(params, opt_state, X, y):
        def loss_fn(p):
            logits = X @ p["w"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # single device
    p1 = {"w": jnp.asarray(w)}
    o1 = tx.init(p1)
    p1, o1, l1 = jax.jit(step)(p1, o1, jnp.asarray(X), jnp.asarray(y))

    # 8-way data parallel
    mesh = create_mesh(n_data=8)
    p2 = {"w": jnp.asarray(w)}
    o2 = tx.init(p2)
    dp_step = make_dp_train_step(step, mesh, donate_state=False)
    p2, o2, l2 = dp_step(p2, o2, X, y)

    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               atol=1e-6)


def test_tp_sharded_matmul_matches_replicated():
    mesh = create_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(1)
    params = {
        "block": {
            "c_fc": {"kernel": rng.standard_normal((8, 16)).astype(np.float32),
                     "bias": rng.standard_normal(16).astype(np.float32)},
            "c_proj": {"kernel": rng.standard_normal((16, 8)).astype(np.float32),
                       "bias": rng.standard_normal(8).astype(np.float32)},
        }
    }
    x = rng.standard_normal((8, 8)).astype(np.float32)

    def mlp(p, x):
        h = jax.nn.relu(x @ p["block"]["c_fc"]["kernel"] + p["block"]["c_fc"]["bias"])
        return h @ p["block"]["c_proj"]["kernel"] + p["block"]["c_proj"]["bias"]

    expected = mlp(params, x)
    sharded = apply_tp_sharding(params, mesh)
    with mesh:
        got = jax.jit(mlp)(sharded, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_dp_shardings_shapes():
    mesh = create_mesh(n_data=8)
    repl, data = dp_shardings(mesh)
    x = jax.device_put(jnp.ones((16, 4)), data)
    assert x.sharding.spec == P("data")


@pytest.mark.heavy
def test_graft_dryrun_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally on finite loss
