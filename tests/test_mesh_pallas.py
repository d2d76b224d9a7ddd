"""Pallas kernels x multi-device mesh composition (interpret mode).

The production extraction/train paths run the fused Pallas kernels on
TPU; the multi-chip story shards batches ('data') and transformer
weights ('model') over a jax.sharding.Mesh.  Real multi-chip hardware is
absent here, so these tests execute the ACTUAL Pallas kernels in
interpret mode over the 8-device virtual CPU mesh (TP x DP) and pin:

  * XLA partitions jitted programs containing pallas_call with
    DP-sharded batches and TP-sharded weights without correctness loss
    (the kernel sees gathered operands; outputs keep the 'data' spec);
  * forward AND the hand-written backward kernels compose with the mesh;
  * the int8 (W8A8) serving kernels compose with the mesh;
  * the whole tiny-CLIP model on the fused-kernel path matches its
    reference-impl twin under the same mesh.

Reference analog: none (the torch reference is single-GPU,
finetune.py:465) — this is net-new multi-chip surface; the kernels
themselves are parity-tested elsewhere (test_fused_attention.py,
test_quant.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _attn_operands(bsz=16, s=12, k=128, heads=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bsz, s, k)) * 0.1, jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k, 3 * k)) * 0.05, jnp.float32)
    kbias = jnp.asarray(0.02 * rng.standard_normal(3 * k), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((k, k)) * 0.05, jnp.float32)
    bo = jnp.asarray(0.02 * rng.standard_normal(k), jnp.float32)
    return x, scale, bias, kernel, kbias, wo, bo, heads


def test_fused_attn_block_fwd_bwd_pallas_under_mesh(mesh):
    """ln_attn_block forced onto the Pallas path (interpret on CPU),
    jitted over the mesh: DP-sharded batch, TP-sharded qkv (column) and
    out-proj (row) weights.  Numerics match the replicated reference;
    the output keeps the 'data' spec; the custom-vjp backward composes
    under the same shardings."""
    from uml_tpu.ops.fused_attention import (ln_attn_block,
                                             ln_attn_block_reference)

    x, scale, bias, kernel, kbias, wo, bo, heads = _attn_operands()
    ref = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                  heads=heads)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    xs = jax.device_put(x, data)
    ktp = jax.device_put(kernel, NamedSharding(mesh, P(None, "model")))
    wotp = jax.device_put(wo, NamedSharding(mesh, P("model", None)))
    sc, bi, kb, bos = (jax.device_put(a, repl)
                       for a in (scale, bias, kbias, bo))

    @jax.jit
    def f(x, scale, bias, kernel, kbias, wo, bo):
        out = ln_attn_block(x, scale, bias, kernel, kbias, wo, bo,
                            heads=heads, impl="pallas")
        # constrain like production activations: XLA otherwise may pick
        # a replicated layout once the weights are TP-sharded
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("data")))

    out = f(xs, sc, bi, ktp, kb, wotp, bos)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g = jax.jit(jax.grad(
        lambda x: f(x, sc, bi, ktp, kb, wotp, bos).sum()))(xs)
    gref = jax.grad(lambda x: ln_attn_block_reference(
        x, scale, bias, kernel, kbias, wo, bo, heads=heads).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               atol=2e-4, rtol=2e-4)


def test_fused_mlp_block_pallas_under_mesh(mesh):
    """ln_mlp_block on the Pallas path under the mesh: TP-sharded
    c_fc (column) / c_proj (row) weights, DP-sharded batch."""
    from uml_tpu.ops.ln_matmul import ln_mlp_block, mlp_block_reference

    rng = np.random.default_rng(3)
    bsz, s, k, m = 16, 12, 128, 512
    x = jnp.asarray(rng.standard_normal((bsz, s, k)) * 0.1, jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(k), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(k), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.02 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.02 * rng.standard_normal(k), jnp.float32)
    ref = mlp_block_reference(x, scale, bias, w1, b1, w2, b2,
                              activation="quick_gelu")

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    xs = jax.device_put(x, data)
    w1tp = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    w2tp = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    sc, bi, b1r, b2r = (jax.device_put(a, repl)
                        for a in (scale, bias, b1, b2))

    @jax.jit
    def f(x, scale, bias, w1, b1, w2, b2):
        out = ln_mlp_block(x, scale, bias, w1, b1, w2, b2,
                           activation="quick_gelu", impl="pallas")
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("data")))

    out = f(xs, sc, bi, w1tp, b1r, w2tp, b2r)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_backward_kernels_interpret_under_mesh(mesh):
    """The hand-written Pallas backward kernels (recompute and stash
    variants) execute in interpret mode with DP-sharded operands over
    the mesh and match their unsharded single-call outputs exactly."""
    from uml_tpu.ops.fused_attention import (_block_bwd_call,
                                             _block_bwd_stash_call,
                                             _block_fwd_stash,
                                             fold_ln_into_matmul)

    x, scale, bias, kernel, kbias, wo, bo, heads = _attn_operands(seed=5)
    d = kernel.shape[1] // (3 * heads)
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    rng = np.random.default_rng(6)
    g = jnp.asarray(rng.standard_normal(x.shape) * 0.1, jnp.float32)

    base = _block_bwd_call(x, g, w_eff, b_eff, wo, 1e-5, heads, d,
                           False, True)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    xs, gs = jax.device_put(x, data), jax.device_put(g, data)
    wr, br, wor = (jax.device_put(a, repl) for a in (w_eff, b_eff, wo))

    call = functools.partial(_block_bwd_call, eps=1e-5, heads=heads,
                             head_dim=d, causal=False, interpret=True)
    got = call(xs, gs, wr, br, wor)
    for name, a, b in zip(("dx", "dqkv", "xn", "attn"), got, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)

    # stash variant: forward stash + its backward, both under the mesh
    _, qkv, _ = _block_fwd_stash(x, w_eff, b_eff, wo, bo, 1e-5, heads, d,
                                 False, True)
    sbase = _block_bwd_stash_call(x, g, qkv, w_eff, b_eff, wo, 1e-5,
                                  heads, d, False, True)
    scall = functools.partial(_block_bwd_stash_call, eps=1e-5, heads=heads,
                              head_dim=d, causal=False, interpret=True)
    sgot = scall(xs, gs, jax.device_put(qkv, data), wr, br, wor)
    for name, a, b in zip(("dx", "dqkv", "xn"), sgot, sbase):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_q8_kernels_pallas_under_mesh(mesh):
    """The int8 W8A8 serving kernels (attention + MLP half-blocks)
    execute in interpret mode under the mesh and match both their
    unsharded Pallas outputs (exact) and the simulated-int8 jnp twin."""
    from uml_tpu.ops.quant import (ln_attn_block_q8,
                                   ln_attn_block_q8_reference,
                                   ln_mlp_block_q8, ln_mlp_block_q8_reference)

    x, scale, bias, kernel, kbias, wo, bo, heads = _attn_operands(seed=9)
    plain = ln_attn_block_q8(x, scale, bias, kernel, kbias, wo, bo,
                             heads=heads, impl="pallas")
    sim = ln_attn_block_q8_reference(x, scale, bias, kernel, kbias, wo, bo,
                                     heads=heads)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    xs = jax.device_put(x, data)
    sc, bi, ker, kb, wor, bos = (jax.device_put(a, repl)
                                 for a in (scale, bias, kernel, kbias,
                                           wo, bo))

    @jax.jit
    def f(x, scale, bias, kernel, kbias, wo, bo):
        out = ln_attn_block_q8(x, scale, bias, kernel, kbias, wo, bo,
                               heads=heads, impl="pallas")
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("data")))

    out = f(xs, sc, bi, ker, kb, wor, bos)
    assert out.sharding.spec == P("data")
    # sharded vs unsharded Pallas: partitioning only changes XLA's
    # epilogue fusions -> 1-ulp differences (the composition signal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               atol=1e-6, rtol=1e-6)
    # vs the simulated-int8 twin: the documented kernel/sim agreement
    # (test_quant.py::test_attn_q8_kernel_matches_q8_reference)
    a, b = np.asarray(out).ravel(), np.asarray(sim).ravel()
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 3e-2
    assert np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.999

    # MLP half
    rng = np.random.default_rng(11)
    k, m = x.shape[-1], 512
    w1 = jnp.asarray(rng.standard_normal((k, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(0.02 * rng.standard_normal(m), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((m, k)) * 0.05, jnp.float32)
    b2 = jnp.asarray(0.02 * rng.standard_normal(k), jnp.float32)
    mplain = ln_mlp_block_q8(x, scale, bias, w1, b1, w2, b2,
                             activation="quick_gelu", impl="pallas")
    msim = ln_mlp_block_q8_reference(x, scale, bias, w1, b1, w2, b2,
                                     activation="quick_gelu")

    @jax.jit
    def fm(x, scale, bias, w1, b1, w2, b2):
        return ln_mlp_block_q8(x, scale, bias, w1, b1, w2, b2,
                               activation="quick_gelu", impl="pallas")

    mout = fm(xs, sc, bi,
              jax.device_put(w1, NamedSharding(mesh, P(None, "model"))),
              jax.device_put(b1, repl),
              jax.device_put(w2, NamedSharding(mesh, P("model", None))),
              jax.device_put(b2, repl))
    np.testing.assert_allclose(np.asarray(mout), np.asarray(mplain),
                               atol=1e-6, rtol=1e-6)
    a, b = np.asarray(mout).ravel(), np.asarray(msim).ravel()
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 3e-2


def test_tiny_clip_fused_pallas_under_tp_dp_mesh(mesh):
    """Whole tiny-CLIP encode_image on the fused-kernel path (every
    half-block a Pallas program, interpret on CPU), TP-sharded
    transformer weights + DP-sharded batch: matches the reference-impl
    twin applied to the SAME params under the same mesh."""
    from uml_tpu.models.clip import CLIP, ClipConfig
    from uml_tpu.parallel import apply_tp_sharding

    cfg = ClipConfig(
        embed_dim=64, image_resolution=64, vision_layers=2,
        vision_width=128, vision_patch_size=16, transformer_width=128,
        transformer_heads=2, transformer_layers=2,
    )
    # ln_matmul_impl='pallas' forces every half-block onto the fused
    # kernels (interpret on CPU); the twin runs the jnp reference path
    fused = CLIP(cfg, dtype=jnp.float32, attn_impl="fused",
                 ln_matmul_impl="pallas")
    refm = CLIP(cfg, dtype=jnp.float32, attn_impl="reference",
                ln_matmul_impl="reference")
    variables = refm.init(jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          jnp.zeros((1, 77), jnp.int32))

    bsz = 8
    imgs = jnp.asarray(np.random.default_rng(1).standard_normal(
        (bsz, 64, 64, 3)) * 0.3, jnp.float32)
    want = refm.apply(variables, imgs,
                      method=lambda m, x: m.encode_image(x))

    data = NamedSharding(mesh, P("data"))
    params = apply_tp_sharding(variables["params"], mesh)
    imgs_s = jax.device_put(imgs, data)

    @jax.jit
    def extract(p, x):
        return fused.apply({"params": p}, x,
                           method=lambda m, x: m.encode_image(x))

    got = extract(params, imgs_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)
