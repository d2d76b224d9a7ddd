"""Fused LN->matmul kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.ops.fused_attention import fold_ln_into_matmul
from uml_tpu.ops.ln_matmul import (
    _ln_matmul_fwd_impl,
    ln_matmul,
    ln_matmul_reference,
    supports_ln_matmul,
)


@pytest.mark.parametrize("n,k,m", [(256, 768, 2304), (100, 512, 1536)])
def test_kernel_matches_reference(n, k, m):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m)) / np.sqrt(k), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)

    w_eff, b_eff = fold_ln_into_matmul(scale, bias, w, b)
    got = _ln_matmul_fwd_impl(x, w_eff, b_eff, 1e-5, 256, True)
    want = ln_matmul_reference(x, scale, bias, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_kernel_bf16_padding_rows():
    """Non-multiple-of-block N: padded rows must not leak into outputs."""
    rng = np.random.default_rng(1)
    n, k, m = 37, 128, 256
    x = jnp.asarray(rng.standard_normal((n, k)), jnp.bfloat16)
    scale = jnp.ones((k,), jnp.float32)
    bias = jnp.zeros((k,), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m)) / np.sqrt(k), jnp.bfloat16)
    b = jnp.zeros((m,), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, w, b)
    got = _ln_matmul_fwd_impl(x, w_eff, b_eff, 1e-5, 256, True)
    want = ln_matmul_reference(x, scale, bias, w, b)
    assert got.shape == (n, m) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.1, rtol=0.05)


@pytest.mark.heavy
def test_auto_impl_reference_on_cpu_and_grads():
    """'auto' falls back to reference math on CPU; grads flow through the
    custom_vjp (used by the full-finetune path)."""
    rng = np.random.default_rng(2)
    k, m = 128, 256
    x = jnp.asarray(rng.standard_normal((4, 6, k)), jnp.float32)
    scale = jnp.ones((k,), jnp.float32)
    bias = jnp.zeros((k,), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m)) / np.sqrt(k), jnp.float32)
    b = jnp.zeros((m,), jnp.float32)

    out = ln_matmul(x, scale, bias, w, b)
    assert out.shape == (4, 6, m)

    def loss(x, scale, bias, w, b):
        return ln_matmul(x, scale, bias, w, b).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, scale, bias, w, b)
    ref_grads = jax.grad(
        lambda *a: ln_matmul_reference(a[0].reshape(-1, k), *a[1:]).sum(),
        argnums=(0, 1, 2, 3, 4))(x.reshape(-1, k), scale, bias, w, b)
    np.testing.assert_allclose(np.asarray(grads[0]).reshape(-1, k),
                               np.asarray(ref_grads[0]), atol=1e-4)
    for g, rg in zip(grads[1:], ref_grads[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg), atol=1e-4)


@pytest.mark.heavy
def test_add_ln_matmul_kernel_matches_reference():
    from uml_tpu.ops.ln_matmul import (
        _add_ln_matmul_fwd_3d,
        add_ln_matmul,
        add_ln_matmul_reference,
    )

    rng = np.random.default_rng(3)
    b, s, k, m = 3, 17, 256, 512
    x = jnp.asarray(rng.standard_normal((b, s, k)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((b, s, k)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, m)) / np.sqrt(k), jnp.float32)
    bb = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)

    for act in (None, "quick_gelu", "gelu_exact"):
        t, out = _add_ln_matmul_fwd_3d(x, delta, scale, bias, w, bb,
                                       1e-5, act, True)
        t_ref, out_ref = add_ln_matmul_reference(x, delta, scale, bias, w, bb,
                                                 activation=act)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   atol=2e-4, rtol=2e-4)

    # grads through the custom_vjp (full-finetune path)
    def loss(x, delta):
        t, out = add_ln_matmul(x, delta, scale, bias, w, bb, gelu=True)
        return (t.sum() + out.sum())

    gx, gd = jax.grad(loss, argnums=(0, 1))(x, delta)
    assert np.isfinite(np.asarray(gx)).all() and np.isfinite(np.asarray(gd)).all()


def test_supports_gate():
    assert supports_ln_matmul(768, 3072)
    assert supports_ln_matmul(512, 1536)
    assert not supports_ln_matmul(60, 256)     # MultiBench-ish dims
    assert not supports_ln_matmul(768, 200)


def test_mlp_block_full_slab_path():
    """bsz >= 64 engages the full-G slab variant of the MLP kernel; its
    output must match the reference exactly like the small-batch form."""
    import jax

    from uml_tpu.ops.ln_matmul import ln_mlp_block, mlp_block_reference

    rng = np.random.default_rng(9)
    bsz, s, k, m = 64, 8, 128, 512
    x = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    got = ln_mlp_block(x, scale, bias, w1, b1, w2, b2,
                       activation="quick_gelu", impl="pallas")
    want = mlp_block_reference(x, scale, bias, w1, b1, w2, b2,
                               activation="quick_gelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.heavy
@pytest.mark.parametrize("activation", [None, "quick_gelu", "gelu_exact"])
def test_mlp_bwd_kernel_matches_reference_vjp(activation):
    """Hand-written MLP-half-block backward vs jax.vjp of the jnp twin
    (interpret mode; grads assembled the way _mlp_block_vjp_bwd does)."""
    from uml_tpu.ops.ln_matmul import (_mlp_bwd_call,
                                       _raw_mlp_block_reference)

    rng = np.random.default_rng(11)
    bsz, s, k, m = 3, 9, 128, 256
    x = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    g = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)

    # assemble grads exactly like _mlp_bwd_via_kernel, but in interpret mode
    dy = jax.lax.dot_general(
        g, w2, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dx_ln, xn, dpre, yact = _mlp_bwd_call(x, dy, b1, w1, 1e-5, activation,
                                          True)
    nums = (((0, 1), (0, 1)), ((), ()))
    got = {
        "dx": np.asarray(dx_ln + g),
        "dw1": np.asarray(jax.lax.dot_general(
            xn, dpre, nums, preferred_element_type=jnp.float32)),
        "db1": np.asarray(jnp.sum(dpre, axis=(0, 1))),
        "dw2": np.asarray(jax.lax.dot_general(
            yact, g, nums, preferred_element_type=jnp.float32)),
        "db2": np.asarray(jnp.sum(g, axis=(0, 1))),
    }

    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _raw_mlp_block_reference(
            x, w1, b1, w2, b2, eps=1e-5, activation=activation),
        x, w1, b1, w2, b2)
    want = dict(zip(("dx", "dw1", "db1", "dw2", "db2"), vjp(g)))

    # gelu_exact: the kernel's polynomial erf (|err| <= 1.5e-7) vs XLA erf
    tol = 5e-4 if activation == "gelu_exact" else 2e-5
    for name in got:
        ref = np.asarray(want[name])
        scale_ref = np.abs(ref).max() + 1e-9
        np.testing.assert_allclose(got[name] / scale_ref, ref / scale_ref,
                                   atol=tol, rtol=tol, err_msg=name)


def test_kernel_gelu_exact_accuracy():
    """The in-kernel exact-GELU (x*sigmoid(odd quintic), clamped +-11)
    must track the XLA-erf GELU to well under the kernel tests' 5e-4 —
    guards the fitted coefficients and the clamp against edits.  Also
    checks the act-grad's rational erf."""
    from uml_tpu.ops.ln_matmul import (_ACTIVATIONS, _KERNEL_ACTIVATIONS,
                                       _act_grad)

    x = jnp.asarray(np.linspace(-40, 40, 400001), jnp.float32)
    got = _KERNEL_ACTIVATIONS["gelu_exact"](x)
    want = _ACTIVATIONS["gelu_exact"](x)
    assert float(jnp.abs(got - want).max()) < 1e-4
    # tails are exact: GELU(x) = x for x >> 0, 0 for x << 0
    np.testing.assert_allclose(
        np.asarray(_KERNEL_ACTIVATIONS["gelu_exact"](x[-1:])),
        np.asarray(x[-1:]), rtol=1e-6)
    grad_ref = jax.vmap(jax.grad(_ACTIVATIONS["gelu_exact"]))(x)
    assert float(jnp.abs(_act_grad(x, "gelu_exact") - grad_ref).max()) < 1e-4

@pytest.mark.heavy
@pytest.mark.parametrize("grp", ["1", "2"])
def test_mlp_bwd_dw_kernel_matches_reference_vjp(grp, monkeypatch):
    """In-kernel-accumulated-dW backward (UML_MLP_BWD=dw, measured
    slower on v5e but kept as the A/B record — tools/exp_bwd_dw.py)
    vs jax.vjp of the jnp twin, grouped and ungrouped."""
    from uml_tpu.ops.ln_matmul import (_mlp_bwd_dw_call,
                                       _raw_mlp_block_reference)

    monkeypatch.setenv("UML_MLP_BWD_G", grp)
    jax.clear_caches()
    rng = np.random.default_rng(13)
    bsz, s, k, m = 4, 9, 128, 256
    x = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    g = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)

    dx, dw1, db1, dw2 = _mlp_bwd_dw_call(x, g, b1, w1, w2, 1e-5,
                                         "quick_gelu", True)
    got = {"dx": dx, "dw1": dw1, "db1": db1, "dw2": dw2,
           "db2": jnp.sum(g, axis=(0, 1))}
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _raw_mlp_block_reference(
            x, w1, b1, w2, b2, eps=1e-5, activation="quick_gelu"),
        x, w1, b1, w2, b2)
    want = dict(zip(("dx", "dw1", "db1", "dw2", "db2"), vjp(g)))
    for name in got:
        ref = np.asarray(want[name])
        sc = np.abs(ref).max() + 1e-9
        np.testing.assert_allclose(np.asarray(got[name]) / sc, ref / sc,
                                   atol=2e-5, rtol=2e-5, err_msg=name)


@pytest.mark.parametrize("activation", ["quick_gelu", "gelu_exact"])
def test_mlp_stash_forward_and_backward_match(activation):
    """_mlp_block_fwd_stash's primal == the plain MLP kernel's, and the
    stash backward (_mlp_bwd_via_stash, no recompute dot) matches the
    jax.vjp of the jnp twin (fp32 here, so the stashed pre is exact)."""
    from uml_tpu.ops.ln_matmul import (_mlp_block_fwd, _mlp_block_fwd_stash,
                                       _mlp_bwd_via_stash,
                                       _raw_mlp_block_reference)

    rng = np.random.default_rng(31)
    bsz, s, k, m = 3, 9, 128, 256
    x = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)

    plain = _mlp_block_fwd(x, w1, b1, w2, b2, 1e-5, activation, True)
    out, pre = _mlp_block_fwd_stash(x, w1, b1, w2, b2, 1e-5, activation,
                                    True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))

    ref, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _raw_mlp_block_reference(
            x, w1, b1, w2, b2, eps=1e-5, activation=activation),
        x, w1, b1, w2, b2)
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    want = vjp(g)
    got = _mlp_bwd_via_stash(x, g, pre, w1, b1, w2, b2, 1e-5, activation)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_mlp_stash_backward_bf16_within_tolerance():
    """Production trains in bf16, where the stashed pre-activation is
    bf16-ROUNDED — the stash backward evaluates act/act' at the rounded
    point, so its grads are an approximation of the exact VJP (unlike
    the lossless fp32 case above).  Pin the approximation error: every
    grad stays within 1% relative-to-max of the exact bf16-forward VJP
    (documented bound; a regression in the stash rounding shows up
    here, not just in train-loss drift)."""
    from uml_tpu.ops.ln_matmul import (_mlp_block_fwd_stash,
                                       _mlp_bwd_via_stash,
                                       _raw_mlp_block_reference)

    rng = np.random.default_rng(7)
    bsz, s, k, m = 4, 24, 256, 1024
    x = jnp.asarray(rng.standard_normal((bsz, s, k)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)

    out, pre = _mlp_block_fwd_stash(x, w1, b1, w2, b2, 1e-5, "quick_gelu",
                                    True)
    assert pre.dtype == jnp.bfloat16  # the approximation under test

    ref, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _raw_mlp_block_reference(
            x, w1, b1, w2, b2, eps=1e-5, activation="quick_gelu"),
        x, w1, b1, w2, b2)
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.bfloat16)
    want = vjp(g.astype(ref.dtype))
    got = _mlp_bwd_via_stash(x, g, pre, w1, b1, w2, b2, 1e-5, "quick_gelu")
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), got, want):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        sc = np.abs(b).max() + 1e-9
        err = np.abs(a - b).max() / sc
        assert err < 1e-2, f"{name}: rel-to-max err {err:.2e}"


def test_mlp_stash_gate_memory_aware(monkeypatch):
    """Auto gate: per-layer stash <= MLP_STASH_MAX_BYTES (bs128 ViT-B in,
    bs512 out — with the attention stash bs512 would blow 16 GB HBM);
    UML_MLP_STASH forces either way."""
    from uml_tpu.ops.ln_matmul import _mlp_stash_enabled

    monkeypatch.delenv("UML_MLP_STASH", raising=False)
    assert _mlp_stash_enabled(128, 197, 3072, 2)       # 155 MB/layer
    assert not _mlp_stash_enabled(512, 197, 3072, 2)   # 620 MB/layer
    monkeypatch.setenv("UML_MLP_STASH", "1")
    assert _mlp_stash_enabled(512, 197, 3072, 2)
    monkeypatch.setenv("UML_MLP_STASH", "0")
    assert not _mlp_stash_enabled(128, 197, 3072, 2)
