"""Fused LN->QKV->attention kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.ops.fused_attention import (
    _block_fwd,
    _fwd,
    fold_ln_into_matmul,
    ln_attn_block,
    ln_attn_block_reference,
    ln_qkv_attention,
    ln_qkv_attention_reference,
    supports_fused_attention,
)


def _setup(rng, s=17, k=128, heads=2, d=64):
    x = jnp.asarray(rng.standard_normal((3, s, k)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, 3 * heads * d)) / np.sqrt(k),
                         jnp.float32)
    kbias = jnp.asarray(0.1 * rng.standard_normal(3 * heads * d), jnp.float32)
    return x, scale, bias, kernel, kbias


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("heads", [2, 4])
def test_kernel_matches_reference(causal, heads):
    rng = np.random.default_rng(0)
    d = 64
    x, scale, bias, kernel, kbias = _setup(rng, heads=heads, d=d)
    got = _fwd(x, scale, bias, kernel, kbias, 1e-5, heads, d, causal, True)
    want = ln_qkv_attention_reference(x, scale, bias, kernel, kbias,
                                      heads=heads, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_head_pair_isolation():
    """A change confined to one head's weights must not leak into the other
    head of the same 128-lane pair (the masked-dot trick is exact)."""
    rng = np.random.default_rng(1)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, heads=heads, d=d)
    base = _fwd(x, scale, bias, kernel, kbias, 1e-5, heads, d, False, True)
    # perturb only head 1's value projection (lanes [2*128+64 : 2*128+128))
    k2 = kernel.at[:, 2 * heads * d + d:].add(1.0)
    out = _fwd(x, scale, bias, k2, kbias, 1e-5, heads, d, False, True)
    np.testing.assert_allclose(np.asarray(base[..., :d]),
                               np.asarray(out[..., :d]), atol=1e-6)
    assert not np.allclose(np.asarray(base[..., d:]), np.asarray(out[..., d:]))


@pytest.mark.heavy
def test_grads_flow_through_custom_vjp():
    rng = np.random.default_rng(2)
    x, scale, bias, kernel, kbias = _setup(rng)

    def loss(x, kernel):
        out = ln_qkv_attention(x, scale, bias, kernel, kbias, heads=2)
        return out.sum()

    gx, gk = jax.grad(loss, argnums=(0, 1))(x, kernel)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gk)).all()
    assert float(jnp.abs(gk).sum()) > 0


@pytest.mark.parametrize("causal", [False, True])
def test_block_kernel_matches_reference(causal):
    """Whole-half-block kernel (LN->QKV->attn->out_proj->residual add)."""
    rng = np.random.default_rng(3)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    got = _block_fwd(x, w_eff, b_eff, wo, bo, 1e-5, heads, d,
                     causal, True)
    want = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                   heads=heads, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


def test_block_grads_flow_through_custom_vjp():
    rng = np.random.default_rng(4)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.zeros(x.shape[-1], jnp.float32)

    def loss(x, kernel, wo):
        out = ln_attn_block(x, scale, bias, kernel, kbias, wo, bo, heads=2)
        return (out * out).sum()

    gx, gk, gw = jax.grad(loss, argnums=(0, 1, 2))(x, kernel, wo)
    for g in (gx, gk, gw):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_supports_gate():
    assert supports_fused_attention(768, 12, 64, 197)   # ViT-B/16
    assert supports_fused_attention(512, 8, 64, 77)     # CLIP text
    assert not supports_fused_attention(768, 12, 192, 197)  # head too wide
    assert not supports_fused_attention(768, 11, 64, 197)   # odd head count
    assert not supports_fused_attention(60, 5, 12, 50)  # MultiBench dims
    # shapes past Mosaic's 16 MB scoped default, admitted via an explicit
    # vmem_limit raise (VERDICT r2 #6): DINO-L/14 and DINO-B/8
    assert supports_fused_attention(1024, 16, 64, 257, with_proj=True)
    assert supports_fused_attention(768, 12, 64, 785, with_proj=True)


@pytest.mark.heavy
def test_block_kernel_dino_l_shape():
    """DINO-L/14-class dims (k=1024, 16 heads, S=257) through the fused
    half-block in interpret mode: past the old 13 MB gate, now admitted
    with an explicit vmem raise — output must still match the reference."""
    from uml_tpu.ops.fused_attention import (ln_attn_block,
                                             ln_attn_block_reference)

    rng = np.random.default_rng(7)
    heads, d, s, k = 16, 64, 257, 1024
    x = jnp.asarray(rng.standard_normal((2, s, k)) * 0.3, jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, 3 * heads * d)) / np.sqrt(k),
                         jnp.float32)
    kbias = jnp.asarray(0.1 * rng.standard_normal(3 * heads * d), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((heads * d, k)) / np.sqrt(heads * d),
                     jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    got = ln_attn_block(x, scale, bias, kernel, kbias, wo, bo, heads=heads,
                        impl="pallas")
    want = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                   heads=heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.heavy
def test_block_kernel_slab_matches_reference(monkeypatch):
    """UML_ATTN_SLAB=1 (QKV projection as one [G*S, K] dot) must be
    numerically equivalent to the per-image path.  The env var is read at
    trace time inside _block_fwd, so a shape no other test uses forces a
    fresh trace under the patched environment."""
    monkeypatch.setenv("UML_ATTN_SLAB", "1")
    rng = np.random.default_rng(11)
    heads, d, s = 2, 64, 21   # s=21 is unique to this test -> retrace
    x, scale, bias, kernel, kbias = _setup(rng, s=s, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    got = _block_fwd(x, w_eff, b_eff, wo, bo, 1e-5, heads, d, False, True)
    want = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                   heads=heads, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.heavy
def test_block_kernel_packed_matches_reference(monkeypatch):
    """UML_ATTN_PACKED=1 (one [Sq,128]x[128,2S] score dot per head pair,
    both heads' keys side by side in the lane dim) must be numerically
    equivalent to the two-dot-per-pair path.  Trace-time env var: a shape
    no other test uses forces a fresh trace (s=23), and a 4-head case
    checks pair iteration under packing."""
    monkeypatch.setenv("UML_ATTN_PACKED", "1")
    rng = np.random.default_rng(12)
    for heads, s in ((2, 23), (4, 23)):
        d = 64
        x, scale, bias, kernel, kbias = _setup(rng, s=s, heads=heads, d=d)
        wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                         / np.sqrt(heads * d), jnp.float32)
        bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
        w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
        got = _block_fwd(x, w_eff, b_eff, wo, bo, 1e-5, heads, d, False, True)
        want = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                       heads=heads, causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.heavy
def test_block_cls_kernel_matches_reference():
    """CLS-only final block: first CLS_ROWS rows equal the full block's."""
    from uml_tpu.ops.fused_attention import CLS_ROWS, _block_cls_fwd

    rng = np.random.default_rng(5)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    got = _block_cls_fwd(x, w_eff, b_eff, wo, bo, 1e-5, heads, d, True)
    assert got.shape == (x.shape[0], CLS_ROWS, x.shape[-1])
    want = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                   heads=heads, causal=False)[:, :CLS_ROWS]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)


@pytest.mark.heavy
def test_block_cls_grads_flow_through_custom_vjp():
    """Grads reach every input (k/v rows beyond CLS_ROWS still matter)."""
    from uml_tpu.ops.fused_attention import CLS_ROWS, ln_attn_block_cls

    rng = np.random.default_rng(6)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.zeros(x.shape[-1], jnp.float32)

    def loss(x, kernel, wo):
        out = ln_attn_block_cls(x, scale, bias, kernel, kbias, wo, bo,
                                heads=heads)
        return (out[:, 0] ** 2).sum()

    gx, gk, gw = jax.grad(loss, argnums=(0, 1, 2))(x, kernel, wo)
    for g in (gx, gk, gw):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
    # the CLS token attends over all rows: late rows of x get gradient
    assert float(jnp.abs(gx[:, CLS_ROWS:]).sum()) > 0


@pytest.mark.heavy
def test_clip_cls_only_matches_full_token_path():
    """encode_image (CLS-only last block) == pooled return_tokens path."""
    from uml_tpu.models.clip import CLIP, ClipConfig

    cfg = ClipConfig(embed_dim=64, image_resolution=32, vision_layers=2,
                     vision_width=128, vision_patch_size=16,
                     transformer_width=128, transformer_heads=2,
                     transformer_layers=2)
    model = CLIP(cfg, dtype=jnp.float32)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
                   jnp.zeros((1, 77), jnp.int32))
    imgs = jnp.asarray(np.random.default_rng(7).standard_normal((2, 32, 32, 3)),
                       jnp.float32)
    feats = model.apply(v, imgs, method=lambda m, x: m.encode_image(x))
    toks = model.apply(v, imgs,
                       method=lambda m, x: m.encode_image(x, return_tokens=True))
    p = v["params"]["visual"]
    x0 = np.asarray(toks)[:, 0, :].astype(np.float32)
    mu = x0.mean(-1, keepdims=True)
    var = np.maximum((x0 * x0).mean(-1, keepdims=True) - mu * mu, 0)
    xn = ((x0 - mu) / np.sqrt(var + 1e-5) * np.asarray(p["ln_post"]["ln"]["scale"])
          + np.asarray(p["ln_post"]["ln"]["bias"]))
    want = xn @ np.asarray(p["proj"])
    np.testing.assert_allclose(np.asarray(feats), want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_block_bwd_kernel_matches_reference_vjp(causal):
    """Hand-written Pallas backward == jax.vjp of the jnp twin
    (interpret mode; dw/db assembled the way _fused_block_bwd does),
    for both the vision (no-max exp2) and causal (text) softmax paths."""
    from uml_tpu.ops.fused_attention import (_block_bwd_call,
                                             _raw_block_reference)

    rng = np.random.default_rng(8)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)

    out, vjp = jax.vjp(
        lambda x, w_eff, b_eff, wo, bo: _raw_block_reference(
            x, w_eff, b_eff, wo, bo, heads=heads, causal=causal, eps=1e-5),
        x, w_eff, b_eff, wo, bo)
    g = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    want = vjp(g)

    dx, dqkv, xn, attn = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5,
                                         heads, d, causal, True)
    nums = (((0, 1), (0, 1)), ((), ()))
    got = (dx,
           jax.lax.dot_general(xn, dqkv, nums),
           jnp.sum(dqkv, axis=(0, 1)),
           jax.lax.dot_general(attn, g, nums),
           jnp.sum(g, axis=(0, 1)))
    for name, a, b in zip(("dx", "dw_eff", "db_eff", "dwo", "dbo"),
                          got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=name)


def test_default_fwd_g_measured_table():
    """The forward kernels' default per-program batch group follows the
    measured per-shape table (round-4 UML_KERNEL_G sweeps): G=4 for the
    S=197 headline (and S=77 text), G=2 for the S=257 towers, G=1 for
    the S=785 DINO-B/8."""
    from uml_tpu.ops.fused_attention import _default_fwd_g

    assert _default_fwd_g(77) == 4
    assert _default_fwd_g(197) == 4
    assert _default_fwd_g(257) == 2
    assert _default_fwd_g(785) == 1


@pytest.mark.parametrize("causal", [False, True])
def test_block_bwd_interleaved_matches_sequential(causal):
    """UML_BWD_IL=N (the stage-interleaved backward) is math-identical
    to the sequential trace order: same dx/dqkv/xn/attn, tight tol
    (accumulation order is preserved per (pair, half) chain)."""
    from uml_tpu.ops.fused_attention import _block_bwd_call

    rng = np.random.default_rng(11)
    heads, d = 4, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    g = jnp.asarray(rng.standard_normal(
        (x.shape[0], x.shape[1], x.shape[2])), jnp.float32)

    base = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5, heads, d,
                           causal, True, il=0)
    # il is a static jit arg (the cache keys on it) — no __wrapped__ /
    # env juggling needed to A/B the interleaved variant
    got = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5,
                          heads, d, causal, True, il=3)
    for name, a, b in zip(("dx", "dqkv", "xn", "attn"), got, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_stash_forward_matches_plain_and_stashes_recompute():
    """_block_fwd_stash's primal output == the plain forward kernel's,
    and the stashed qkv/attn are bit-identical to what the backward
    kernel recomputes (same dots, same casts) — the contract that lets
    the stash backward skip the recompute without changing any grad."""
    from uml_tpu.ops.fused_attention import (_block_bwd_call,
                                             _block_fwd, _block_fwd_stash)

    rng = np.random.default_rng(21)
    heads, d = 2, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)

    plain = _block_fwd(x, w_eff, b_eff, wo, bo, 1e-5, heads, d, False, True)
    out, qkv, attn = _block_fwd_stash(x, w_eff, b_eff, wo, bo, 1e-5,
                                      heads, d, False, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))

    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    _, _, _, attn_re = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5,
                                       heads, d, False, True)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(attn_re),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_stash_backward_matches_plain_backward(causal):
    """_block_bwd_stash_call fed the forward-stashed qkv produces the
    same dx/dqkv/xn as the recomputing backward (tight tol: the stashed
    qkv is the same value the recompute produces)."""
    from uml_tpu.ops.fused_attention import (_block_bwd_call,
                                             _block_bwd_stash_call,
                                             _block_fwd_stash)

    rng = np.random.default_rng(22)
    heads, d = 4, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    base = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5, heads, d,
                           causal, True)
    _, qkv, _ = _block_fwd_stash(x, w_eff, b_eff, wo, bo, 1e-5, heads, d,
                                 causal, True)
    got = _block_bwd_stash_call(x, g, qkv, w_eff, b_eff, wo, 1e-5,
                                heads, d, causal, True)
    for name, a, b in zip(("dx", "dqkv", "xn"), got, base[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_stash_backward_interleaved_matches_sequential():
    """UML_BWD_IL on the STASH backward is math-identical to its
    sequential trace order (same guarantee as the recompute kernel's IL
    twin; accumulation order preserved per (pair, half) chain)."""
    from uml_tpu.ops.fused_attention import (_block_bwd_stash_call,
                                             _block_fwd_stash)

    rng = np.random.default_rng(23)
    heads, d = 4, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    bo = jnp.asarray(0.1 * rng.standard_normal(x.shape[-1]), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    g = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    _, qkv, _ = _block_fwd_stash(x, w_eff, b_eff, wo, bo, 1e-5, heads, d,
                                 False, True)

    base = _block_bwd_stash_call(x, g, qkv, w_eff, b_eff, wo, 1e-5,
                                 heads, d, False, True, il=0)
    got = _block_bwd_stash_call(x, g, qkv, w_eff, b_eff, wo,
                                1e-5, heads, d, False, True, il=3)
    for name, a, b in zip(("dx", "dqkv", "xn"), got, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_cls_backward_kernel_matches_zero_pad_path():
    """The dedicated CLS backward == the zero-pad full backward's grads
    (which in turn match jax.vjp of the sliced reference): the dropped
    rows were exact zeros, so tolerances are tight."""
    from uml_tpu.ops.fused_attention import (CLS_ROWS, _block_bwd_call,
                                             _block_bwd_cls_call)

    rng = np.random.default_rng(24)
    heads, d = 4, 64
    x, scale, bias, kernel, kbias = _setup(rng, s=33, heads=heads, d=d)
    wo = jnp.asarray(rng.standard_normal((heads * d, x.shape[-1]))
                     / np.sqrt(heads * d), jnp.float32)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    g8 = jnp.asarray(rng.standard_normal(
        (x.shape[0], CLS_ROWS, x.shape[2])), jnp.float32)

    g_full = jnp.zeros(x.shape, g8.dtype).at[:, :CLS_ROWS].set(g8)
    dx_w, dqkv_w, xn_w, attn_w = _block_bwd_call(
        x, g_full, w_eff, b_eff, wo, 1e-5, heads, d, False, True)
    dx, dqkv, xn, attn8 = _block_bwd_cls_call(
        x, g8, w_eff, b_eff, wo, 1e-5, heads, d, True)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_w),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_w),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_w),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(attn8),
                               np.asarray(attn_w)[:, :CLS_ROWS],
                               atol=1e-5, rtol=1e-5)
