"""Fused LayerNorm -> matmul Pallas kernel (the pre-LN transformer hot op).

Motivation (profiled on v5e, ViT-B/16 bf16 bs512): XLA lowers each
fp32-statistics LayerNorm to a standalone convert+reduce fusion running at
~62 GB/s effective — 27 of them cost 67 ms of a 204 ms forward, 13x under
the HBM bandwidth bound.  A standalone Pallas LN is *worse* (pallas_call is
a fusion barrier and XLA's LN fusions absorb the surrounding casts/adds),
so the fix is to make the LN free: in a pre-LN block every LayerNorm's only
consumer is a matmul (ln_1 -> qkv, ln_2 -> c_fc), and this kernel computes
the normalization on the row tile while it is already VMEM-resident for the
matmul — one HBM read of x, no separate stats pass, MXU does the dot.

The reference runs these as separate torch ops (engine/clip/model.py:153-186,
nn.LayerNorm then nn.Linear); fusing them is pure implementation freedom.

Forward: Pallas kernel (TPU).  Backward: custom_vjp recomputing through
the jnp reference — measured AT the 5-matmul FLOP floor at ViT-B/16 bs128
(XLA fuses the elementwise passes into the dots).  A hand-written Pallas
backward exists (_mlp_bwd_kernel, UML_MLP_BWD=kernel) and measured ~9%
slower end-to-end, unlike the attention half-block where the hand-written
backward won ~30% — kept for re-evaluation on shapes where XLA's autodiff
regresses.  Statistics are fp32 regardless of input dtype; the normalized
activation is cast to the weight dtype before hitting the MXU (bf16 in
production).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ln_matmul_reference(x, scale, bias, w, b, *, eps: float = 1e-5,
                        activation: str | None = None):
    """jnp reference: fp32-stats LN over the last axis, then
    act(x_n @ w + b).

    Matches flax LayerNorm(use_fast_variance=True) statistics:
    var = max(0, E[x^2] - E[x]^2).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    xn = xn.astype(w.dtype)
    out = jnp.dot(xn, w, preferred_element_type=jnp.float32)
    out = _ACTIVATIONS[activation](out + b.astype(jnp.float32))
    return out.astype(x.dtype)


def _ln_matmul_kernel(x_ref, w_ref, b_ref, o_ref, *,
                      eps, activation=None):
    """Raw-LN form: the LN scale/bias are folded into w/b by the caller
    ((xn*s + t) @ W == xn @ (s*W) + t@W) — the normalize is two VPU passes
    on the VMEM-resident tile, the MXU does the rest."""
    xf = x_ref[:].astype(jnp.float32)                       # [BN, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
    out = jnp.dot(xn, w_ref[:],
                  preferred_element_type=jnp.float32)       # [BN, M]
    out = _KERNEL_ACTIVATIONS[activation](out + b_ref[:].astype(jnp.float32))
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_matmul_kernel_3d(x_ref, w_ref, b_ref, o_ref, *,
                         eps, activation=None):
    """Multi-batch-entry program: x_ref [G, S, K].  G independent images
    per program give the VLIW scheduler parallel chains (one image's
    activation epilogue overlaps another's MXU dot)."""
    for j in range(x_ref.shape[0]):
        xf = x_ref[j].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
        out = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
        out = _KERNEL_ACTIVATIONS[activation](out + b_ref[:].astype(jnp.float32))
        o_ref[j] = out.astype(o_ref.dtype)


def _mlp_block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      eps, activation, slab):
    """Whole MLP half-block, VMEM-resident: o = x + act(rawLN(x) @ w1 +
    b1) @ w2 + b2.  The [S, 4K] hidden activation never exists in HBM
    (619 MB/layer write + read at ViT-B/16 bs512), and the residual add
    rides the same program.  LN scale/bias are pre-folded into w1/b1.

    Every op is row-wise, so the G batch entries collapse into one
    [G*S, K] slab: one big dot per matmul instead of G small ones, and
    the MXU sublane padding amortizes (197 -> 208 rows is 5.6% waste per
    image; 4*197 -> 800 is 1.5% — same-window A/B: 5019 vs 4994 img/s
    extraction vs two-image slabs).  ``slab`` (from the caller) drops to
    2 at small batch sizes, where XLA promotes the small operand arrays
    into VMEM and the full slab's ~15.8 MB fp32 hidden then overflows
    the 16 MB scoped-VMEM limit (measured: B=4/12 hard compile failure
    with the full slab, fine with pairs)."""
    g, s, k = x_ref.shape
    step = slab if g % slab == 0 else (2 if g % 2 == 0 else 1)
    for j0 in range(0, g, step):
        xf = x_ref[j0:j0 + step].reshape(step * s, k).astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w1_ref.dtype)
        y = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
        y = _KERNEL_ACTIVATIONS[activation](y + b1_ref[:].astype(jnp.float32))
        y = y.astype(w2_ref.dtype)
        out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
        out = (xf + out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[j0:j0 + step] = out.reshape(step, s, k)


@functools.partial(jax.jit, static_argnames=("eps", "activation",
                                             "interpret"))
def _mlp_block_fwd(x, w1, b1, w2, b2, eps, activation, interpret):
    from uml_tpu.ops.fused_attention import _default_fwd_g, _group_and_params

    bsz, s, k = x.shape
    m = w1.shape[1]
    # legacy-fit shapes (ViT-B-class, the round-2 empirical 10 MB weight
    # gate) keep Mosaic's default limit — measured-good; only the newly
    # enabled larger shapes get an explicit vmem raise
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: None if 2 * k * m * w1.dtype.itemsize
        <= 10 * 1024 * 1024 and s <= 260
        else mlp_block_vmem_bytes(k, m, s, w1.dtype.itemsize, g,
                                  _mlp_slab(g, bsz, s)))
    slab = _mlp_slab(g, bsz, s) if bsz >= 64 else 2
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, eps=eps, activation=activation,
                          slab=slab),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * s * k * m,
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + 2 * w1.size * w1.dtype.itemsize),
            transcendentals=bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


MLP_STASH_MAX_BYTES = 256 * 2**20  # per-layer pre-stash cap (see gate)


def _mlp_stash_enabled(bsz, s, m, itemsize):
    """Train-time stash of the MLP half-block's pre-activation
    (UML_MLP_STASH, default auto): the backward otherwise recomputes
    pre = LN(x) @ w1 + b1 — 2*S*K*4K MACs/img/layer, one of the five
    equal-size dots in the MLP backward (~20% of its MXU work).
    Stashing pre (bf16, [S, 4K]) from the forward removes that dot; the
    backward evaluates act/act' at the bf16-rounded pre, a perturbation
    of the same order as the bf16 casts the grads undergo anyway.
    Auto gates on memory: ON when one layer's stash stays under
    MLP_STASH_MAX_BYTES (bs128 ViT-B: 155 MB/layer, 1.9 GB for the
    12-layer tower; bs512's 620 MB/layer stays with the recompute —
    with the attention stash it would not fit 16 GB HBM)."""
    env = os.environ.get("UML_MLP_STASH", "auto")
    if env in ("0", "1"):
        return env == "1"
    return bsz * s * m * itemsize <= MLP_STASH_MAX_BYTES


def _mlp_block_kernel_stash(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                            o_ref, pre_ref, *, eps, activation, slab):
    """_mlp_block_kernel twin that also writes the pre-activation
    (pre = rawLN(x) @ w1 + b1, bias included) for the stash backward.
    Used only under differentiation (custom_vjp fwd)."""
    g, s, k = x_ref.shape
    step = slab if g % slab == 0 else (2 if g % 2 == 0 else 1)
    for j0 in range(0, g, step):
        xf = x_ref[j0:j0 + step].reshape(step * s, k).astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w1_ref.dtype)
        pre = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
        pre = pre + b1_ref[:].astype(jnp.float32)
        m = pre.shape[-1]
        pre_ref[j0:j0 + step] = pre.astype(pre_ref.dtype).reshape(
            step, s, m)
        y = _KERNEL_ACTIVATIONS[activation](pre).astype(w2_ref.dtype)
        out = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
        out = (xf + out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[j0:j0 + step] = out.reshape(step, s, k)


@functools.partial(jax.jit, static_argnames=("eps", "activation",
                                             "interpret"))
def _mlp_block_fwd_stash(x, w1, b1, w2, b2, eps, activation, interpret):
    from uml_tpu.ops.fused_attention import _default_fwd_g, _group_and_params

    bsz, s, k = x.shape
    m = w1.shape[1]
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: mlp_block_vmem_bytes(
            k, m, s, w1.dtype.itemsize, g, _mlp_slab(g, bsz, s))
        + 2 * g * s * m * x.dtype.itemsize)
    slab = _mlp_slab(g, bsz, s) if bsz >= 64 else 2
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel_stash, eps=eps,
                          activation=activation, slab=slab),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),   # out
            jax.ShapeDtypeStruct((bsz, s, m), x.dtype),   # pre stash
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * s * k * m,
            bytes_accessed=((2 * s * k + s * m) * bsz * x.dtype.itemsize
                            + 2 * w1.size * w1.dtype.itemsize),
            transcendentals=bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _mlp_bwd_via_stash(x, g, pre, w1, b1, w2, b2, eps, activation):
    """All five grads from the forward-stashed pre-activation — pure XLA
    (the recompute dot is gone, the rest are full-rate batched matmuls
    with fused elementwise passes).  Matches the Pallas backward's dtype
    choices: the dots contract bf16 operands, accumulation in fp32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xnb = xn32.astype(w1.dtype)

    pre32 = pre.astype(jnp.float32)
    yact = _ACTIVATIONS[activation](pre32).astype(w2.dtype)
    dy = jax.lax.dot_general(
        g, w2, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [B, S, M]
    dpre = dy * _act_grad(pre32, activation)
    dpreb = dpre.astype(w1.dtype)

    dxn = jax.lax.dot_general(
        dpreb, w1, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [B, S, K]
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dx = (rstd * (dxn - m1 - xn32 * m2)
          + g.astype(jnp.float32)).astype(x.dtype)

    nums = (((0, 1), (0, 1)), ((), ()))   # contract (batch, seq)
    dw1 = jax.lax.dot_general(xnb, dpreb, nums,
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre, axis=(0, 1))
    dw2 = jax.lax.dot_general(yact, g, nums,
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _act_grad(pre, activation):
    """d act(pre) / d pre in fp32 (kernel-safe: rational erf)."""
    if activation is None:
        return jnp.ones_like(pre)
    if activation == "quick_gelu":
        s = 1.0 / (1.0 + jnp.exp(-1.702 * pre))
        return s * (1.0 + 1.702 * pre * (1.0 - s))
    if activation == "gelu_exact":
        phi_big = 0.5 * (1.0 + _erf_poly(pre * (2.0 ** -0.5)))
        phi_small = jnp.exp(-0.5 * pre * pre) * 0.3989422804014327
        return phi_big + pre * phi_small
    raise ValueError(activation)


def _mlp_bwd_kernel(x_ref, dy_ref, b1_ref, w1_ref, dx_ref, xn_ref, dpre_ref,
                    yact_ref, *, eps, activation):
    """Hand-written backward of the MLP half-block (mirror of
    fused_attention._block_bwd_kernel's structure).

    One batch entry per program, only w1 resident (4.7 MB at ViT-B).
    ``dy`` = g @ w2^T is computed by XLA outside (a clean full-rate
    batched matmul).  The kernel recomputes LN -> pre = xn @ w1 + b1 in
    VMEM, forms dpre = dy * act'(pre) and dxn = dpre @ w1^T, and runs the
    LN backward — the [S, 4K] fp32 hidden/act' tensors never exist in
    HBM (XLA's autodiff of the jnp twin streamed them at fp32: measured
    ~2.2 ms/layer bwd at bs128 vs ~1.3 ideal).  ``xn``/``dpre``/``yact``
    go out bf16 so the weight/bias grads are large 2-dim-contraction XLA
    dots at full MXU rate:
        dw1 = xn^T @ dpre    db1 = sum(dpre)
        dw2 = yact^T @ g     db2 = sum(g)      dx += g (residual)
    b1 is exactly absent from this kernel: act'(pre) needs pre WITH the
    bias, which rides the matmul epilogue; db1 comes from dpre's sums.
    """
    xf = x_ref[0].astype(jnp.float32)                        # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xnb = xn32.astype(w1_ref.dtype)
    xn_ref[0] = xnb.astype(xn_ref.dtype)

    pre = jnp.dot(xnb, w1_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[:].astype(jnp.float32)
    yact_ref[0] = _KERNEL_ACTIVATIONS[activation](pre).astype(yact_ref.dtype)
    dpre = dy_ref[0].astype(jnp.float32) * _act_grad(pre, activation)
    dpreb = dpre.astype(w1_ref.dtype)
    dpre_ref[0] = dpreb.astype(dpre_ref.dtype)

    dxn = jax.lax.dot_general(
        dpreb, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, K]
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dx_ref[0] = (rstd * (dxn - m1 - xn32 * m2)).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "activation",
                                             "interpret"))
def _mlp_bwd_call(x, dy, b1, w1, eps, activation, interpret):
    bsz, s, k = x.shape
    m = w1.shape[1]
    dx, xn, dpre, yact = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, activation=activation),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # dx (pre-residual)
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # xn
            jax.ShapeDtypeStruct((bsz, s, m), x.dtype),    # dpre
            jax.ShapeDtypeStruct((bsz, s, m), x.dtype),    # yact
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * s * k * m,
            bytes_accessed=((3 * bsz * s * k + 3 * bsz * s * m)
                            * x.dtype.itemsize
                            + w1.size * w1.dtype.itemsize),
            transcendentals=2 * bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, dy, b1, w1)
    return dx, xn, dpre, yact


def _mlp_bwd_via_kernel(x, g, w1, b1, w2, b2, eps, activation):
    """Assemble all five grads: dy by XLA, dx/intermediates by the Pallas
    backward, weight/bias grads as large 2-dim-contraction XLA dots."""
    dy = jax.lax.dot_general(
        g, w2, dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)  # [B, S, M]
    dx_ln, xn, dpre, yact = _mlp_bwd_call(x, dy, b1, w1, eps, activation,
                                          False)
    nums = (((0, 1), (0, 1)), ((), ()))   # contract (batch, seq)
    dw1 = jax.lax.dot_general(xn, dpre, nums,
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=(0, 1))
    dw2 = jax.lax.dot_general(yact, g, nums,
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    dx = (dx_ln.astype(jnp.float32) + g.astype(jnp.float32)).astype(x.dtype)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _mlp_bwd_dw_kernel(x_ref, g_ref, b1_ref, w1_ref, w2_ref,
                       dx_ref, dw1_ref, db1_ref, dw2_ref, *,
                       eps, activation):
    """In-kernel-accumulated-dW backward of the MLP half-block
    (UML_MLP_BWD=dw).  Everything the gradient needs stays in VMEM: the
    kernel recomputes LN -> pre -> act, forms dy = g @ w2^T, dpre, dxn
    and the LN backward, AND accumulates the weight/bias grads across
    the sequential batch grid into fp32 VMEM-resident outputs
    (constant-index blocks, revisited every step):
        dw1 += xn^T @ dpre    db1 += colsum(dpre)    dw2 += yact^T @ g
    so no hidden-width [S, 4K] tensor (dy/dpre/yact — or the fp32 hidden
    XLA's autodiff twin streams) ever exists in HBM.  HBM traffic is
    exactly read-x + read-g + write-dx + the resident weights.
    Motivation: tools/exp_train_bs512.py measured the composed backward
    batch-invariant ~20-24% over its kernel-sum floor — the size of
    these hidden-width HBM round trips.  db2 = sum(g) rides outside on
    the already-HBM-resident g.  Same 5-matmul FLOP count as XLA's
    autodiff; the dW contractions run over grp*S rows per step.
    VERDICT: measured 1.16x SLOWER than XLA's autodiff at ViT-B/16
    bs512 (tools/exp_bwd_dw.py — the grp*197-row dW contractions pad
    ~30% on the MXU, costing more than the avoided HBM round trips);
    kept opt-in as the measured record."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    grp, s, k = x_ref.shape
    xf = x_ref[...].reshape(grp * s, k).astype(jnp.float32)
    gof = g_ref[...].reshape(grp * s, k)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xnb = xn32.astype(w1_ref.dtype)

    pre = jnp.dot(xnb, w1_ref[:], preferred_element_type=jnp.float32)
    pre = pre + b1_ref[:].astype(jnp.float32)
    yactb = _KERNEL_ACTIVATIONS[activation](pre).astype(w1_ref.dtype)
    dy = jax.lax.dot_general(
        gof, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [G*S, M]
    dpre = dy * _act_grad(pre, activation)
    dpreb = dpre.astype(w1_ref.dtype)

    dxn = jax.lax.dot_general(
        dpreb, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [G*S, K]
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dxl = rstd * (dxn - m1 - xn32 * m2) + gof.astype(jnp.float32)
    dx_ref[...] = dxl.astype(dx_ref.dtype).reshape(grp, s, k)

    rows = (((0,), (0,)), ((), ()))       # contract the row axis
    dw1_ref[...] += jax.lax.dot_general(
        xnb, dpreb, rows, preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        yactb, gof, rows, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps", "activation",
                                             "interpret"))
def _mlp_bwd_dw_call(x, g, b1, w1, w2, eps, activation, interpret):
    bsz, s, k = x.shape
    m = w1.shape[1]
    grp = int(os.environ.get("UML_MLP_BWD_G", 1))
    while grp > 1 and bsz % grp != 0:
        grp //= 2
    # resident weights + fp32 dW accumulators + per-step fp32 hidden
    # temps + double-buffered in/out tiles
    need = ((w1.size + w2.size) * w1.dtype.itemsize
            + (2 * k * m + m) * 4
            + grp * s * (4 * m * 4 + 4 * k * 4)
            + 2 * 3 * grp * s * k * x.dtype.itemsize)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need * 1.3), 96 * 2**20),
        dimension_semantics=("arbitrary",))
    dx, dw1, db1, dw2 = pl.pallas_call(
        functools.partial(_mlp_bwd_dw_kernel, eps=eps,
                          activation=activation),
        grid=(bsz // grp,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),     # dx (+residual)
            jax.ShapeDtypeStruct((k, m), jnp.float32),      # dw1
            jax.ShapeDtypeStruct((1, m), jnp.float32),      # db1
            jax.ShapeDtypeStruct((m, k), jnp.float32),      # dw2
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bsz * s * k * m,
            bytes_accessed=(3 * bsz * s * k * x.dtype.itemsize
                            + (w1.size + w2.size) * w1.dtype.itemsize
                            + (2 * k * m + m) * 4),
            transcendentals=2 * bsz * s * m,
        ),
        interpret=interpret,
    )(x, g, b1, w1, w2)
    return dx, dw1, db1[0], dw2


def _mlp_bwd_dw_via_kernel(x, g, w1, b1, w2, b2, eps, activation):
    """All five grads with the in-kernel-dW backward; only db2 (a cheap
    reduce over the already-materialized g) runs outside."""
    dx, dw1, db1, dw2 = _mlp_bwd_dw_call(x, g, b1, w1, w2, eps, activation,
                                         jax.default_backend() == "cpu")
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


def _raw_mlp_block_reference(x, w1, b1, w2, b2, *, eps, activation):
    """jnp twin of _mlp_block_kernel (post-fold form), for the custom_vjp."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w1.dtype)
    y = jnp.dot(xn, w1, preferred_element_type=jnp.float32)
    y = _ACTIVATIONS[activation](y + b1.astype(jnp.float32)).astype(w2.dtype)
    out = jnp.dot(y, w2, preferred_element_type=jnp.float32)
    return (xf + out + b2.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp_block(x, w1, b1, w2, b2, eps, activation):
    interpret = jax.default_backend() == "cpu"
    return _mlp_block_fwd(x, w1, b1, w2, b2, eps, activation, interpret)


def _mlp_block_vjp_fwd(x, w1, b1, w2, b2, eps, activation):
    on_tpu = jax.default_backend() not in ("cpu",)
    if (on_tpu and x.ndim == 3 and activation is not None
            and _mlp_stash_enabled(x.shape[0], x.shape[1], w1.shape[1],
                                   x.dtype.itemsize)):
        out, pre = _mlp_block_fwd_stash(x, w1, b1, w2, b2, eps,
                                        activation, False)
        return out, (x, w1, b1, w2, b2, pre)
    return (_mlp_block(x, w1, b1, w2, b2, eps, activation),
            (x, w1, b1, w2, b2, None))


def _mlp_block_vjp_bwd(eps, activation, res, g):
    x, w1, b1, w2, b2, pre = res
    if pre is not None:
        return _mlp_bwd_via_stash(x, g, pre, w1, b1, w2, b2, eps,
                                  activation)
    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("UML_MLP_BWD") == "dw"
            and x.ndim == 3):
        # in-kernel-accumulated-dW backward — measured SLOWER (1.16x,
        # tools/exp_bwd_dw.py: the grp*S-row dW contractions pad ~30% on
        # the MXU, which costs more than the hidden-width HBM round
        # trips save).  Kept opt-in as the measured record.
        return _mlp_bwd_dw_via_kernel(x, g, w1, b1, w2, b2, eps, activation)
    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("UML_MLP_BWD") == "kernel"):
        # hand-written Pallas backward — measured SLOWER than XLA's
        # autodiff of the jnp twin at ViT-B/16 bs128 (37 ms vs 34 ms for
        # the 12-layer stack, same-window A/B): XLA already runs the
        # 5-matmul MLP backward at its FLOP floor with the elementwise
        # passes fused, unlike the attention case where it materialized
        # per-head [S, S] probabilities.  Kept behind UML_MLP_BWD=kernel
        # for re-evaluation on other shapes.
        return _mlp_bwd_via_kernel(x, g, w1, b1, w2, b2, eps, activation)
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _raw_mlp_block_reference(
            x, w1, b1, w2, b2, eps=eps, activation=activation),
        x, w1, b1, w2, b2)
    return vjp(g)


_mlp_block.defvjp(_mlp_block_vjp_fwd, _mlp_block_vjp_bwd)


def mlp_block_reference(x, scale, bias, w1, b1, w2, b2, *,
                        eps: float = 1e-5, activation: str | None = None):
    """jnp reference: x + act(LN(x) @ w1 + b1) @ w2 + b2."""
    y = ln_matmul_reference(x, scale, bias, w1, b1, eps=eps,
                            activation=activation)
    out = jnp.dot(y.astype(w2.dtype), w2, preferred_element_type=jnp.float32)
    return (x.astype(jnp.float32) + out
            + b2.astype(jnp.float32)).astype(x.dtype)


def _mlp_slab(g, bsz, seq_len):
    """Rows processed per in-kernel dot: the full G group at production
    batches (amortizes MXU sublane padding — measured +0.5% at ViT-B
    bs512) as long as the fp32 hidden slab stays modest; long-sequence
    shapes (DINO-B/8's S=785) and small batches use smaller slabs."""
    if bsz >= 64 and g * seq_len <= 1024:
        return g
    return min(g, 2) if seq_len <= 512 else 1


def mlp_block_vmem_bytes(k, m, seq_len, itemsize=2, g=1, slab=None):
    """Estimated VMEM need of the MLP half-block kernel: both weights
    resident + double-buffered in/out tiles + the fp32 hidden slab."""
    if slab is None:
        slab = g
    w = 2 * k * m * itemsize
    tiles = 2 * g * seq_len * 2 * k * itemsize
    hidden = slab * seq_len * m * (4 + itemsize)
    return w + tiles + hidden


def supports_mlp_block(k: int, m: int, seq_len: int = 197,
                       itemsize: int = 2) -> bool:
    """Lane-aligned dims; the working set must fit under the VMEM ceiling
    (shapes past Mosaic's 16 MB scoped default — DINO-L's k=1024 m=4096,
    DINO-B/8's S=785 — get an explicit vmem_limit raise instead of
    falling back)."""
    from uml_tpu.ops.fused_attention import VMEM_CEILING

    return (k % 128 == 0 and m % 128 == 0
            and mlp_block_vmem_bytes(k, m, seq_len, itemsize, g=1)
            <= VMEM_CEILING)


def ln_mlp_block(x, scale, bias, w1, b1, w2, b2, *, eps: float = 1e-5,
                 activation: str | None = None, impl: str = "auto"):
    """x + act(LN(x) @ w1 + b1) @ w2 + b2: the MLP half of a pre-LN
    residual block in one Pallas program per batch group.

    Complements ops.fused_attention.ln_attn_block — together a ViT layer
    is exactly two Pallas programs and zero intermediate HBM tensors.
    """
    k = x.shape[-1]
    m = w1.shape[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3 and w2.shape == (m, k)
                and supports_mlp_block(k, m, x.shape[1], w1.dtype.itemsize)
                else "reference")
    if impl == "pallas":
        from uml_tpu.ops.fused_attention import fold_ln_into_matmul

        w1_eff, b1_eff = fold_ln_into_matmul(scale, bias, w1, b1)
        return _mlp_block(x, w1_eff, b1_eff, w2, b2, eps, activation)
    return mlp_block_reference(x, scale, bias, w1, b1, w2, b2, eps=eps,
                               activation=activation)


def _quick_gelu_f32(x):
    return x * (1.0 / (1.0 + jnp.exp(-1.702 * x)))


def _gelu_exact_f32(x):
    # erf-based GELU (DINO uses nn.gelu(approximate=False))
    return x * 0.5 * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _erf_poly(x):
    """erf as an odd (4,3) rational in x^2 (max abs err 3.5e-6): Mosaic
    has no erf lowering, and 3.5e-6 is far below the bf16 activations the
    kernels carry.  FMA polynomials + one divide, and crucially NO
    exp/abs/sign: the previous A&S 7.1.26 form cost a measured 6.5% of
    the whole composed DINOv2-B/14 forward (3134 -> 3338 img/s with a
    quick_gelu-cost epilogue; identity epilogue 3354 — the VPU
    transcendental chain does not hide under the S=257 MXU dots,
    tools/exp_dino_act.py).  Oddness makes sign handling free; the clip
    to |x| <= 4 makes the tails exact to 1.6e-8 (erf(4) = 1 - 1.6e-8)."""
    xc = jnp.clip(x, -4.0, 4.0)
    z = xc * xc
    num = ((((-4.9571187842836585e-06 * z + 1.1210895988527634e-03) * z
             + 4.781261600463291e-02) * z + 1.6182750471331497e-01) * z
           + 1.1284049804404754e+00)
    den = (((1.1341809282754814e-02 * z + 1.008262676215077e-01) * z
            + 4.7695627529928103e-01) * z + 1.0)
    return xc * num / den


def _gelu_exact_kernel(x):
    """Exact-GELU epilogue in quick_gelu's op shape: x * sigmoid(q(x))
    with q an odd quintic fitted to make the sigmoid form match the
    erf-based GELU (max abs err 7.8e-5 — 6x under the kernel tests'
    5e-4 and ~50x under bf16 resolution at |x|~1).  Measured on the
    composed DINOv2-B/14 forward (tools/exp_dino_act.py): the A&S
    erf epilogue cost 6.5% of the whole forward, the (4,3) rational
    erf 3.2%, quick_gelu's x*sigmoid(kx) shape 0.4% — so exact GELU is
    computed in that shape.  q's quintic coefficient is negative, so x
    is clamped to the fit domain [-12, 12] before q (sigmoid(q(12)) =
    1 - 5e-13 at the ±11 clamp used, so beyond it GELU(x) = x exactly
    to fp32)."""
    xc = jnp.clip(x, -11.0, 11.0)
    z = xc * xc
    q = xc * (1.5965369886364993
              + z * (0.07282312497589535 + z * -0.0005347207905680217))
    return x * (1.0 / (1.0 + jnp.exp(-q)))


# reference (jnp) table: XLA-exact erf
_ACTIVATIONS = {None: lambda x: x, "quick_gelu": _quick_gelu_f32,
                "gelu_exact": _gelu_exact_f32}
# in-kernel table: identical except erf -> polynomial (no Mosaic erf)
_KERNEL_ACTIVATIONS = {None: lambda x: x, "quick_gelu": _quick_gelu_f32,
                       "gelu_exact": _gelu_exact_kernel}


def _add_ln_matmul_kernel(x_ref, d_ref, scale_ref, bias_ref, w_ref, b_ref,
                          t_ref, o_ref, *, eps, activation):
    """t = x + delta; o = act(LN(t) @ w + b).  Absorbs the residual add
    and the activation into the matmul program (both were standalone HBM
    passes once pallas_call broke XLA's fusion regions)."""
    t = (x_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32))
    t_ref[:] = t.astype(t_ref.dtype)
    mean = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(t * t, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (t - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out = jnp.dot(xn.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out = _KERNEL_ACTIVATIONS[activation](out)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "activation", "interpret"))
def _add_ln_matmul_fwd_3d(x, delta, scale, bias, w, b, eps, activation,
                          interpret):
    """x, delta: [B, S, K] -> (t = x + delta [B, S, K], out [B, S, M])."""
    bsz, s, k = x.shape
    m = w.shape[1]
    t, out = pl.pallas_call(
        functools.partial(_add_ln_matmul_kernel, eps=eps,
                          activation=activation),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((None, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
            jax.ShapeDtypeStruct((bsz, s, m), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * k * m,
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + bsz * s * (k + m) * x.dtype.itemsize),
            transcendentals=bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, delta, scale, bias, w, b)
    return t, out


def add_ln_matmul_reference(x, delta, scale, bias, w, b, *, eps: float = 1e-5,
                            activation: str | None = None):
    """jnp reference for the fused residual-add -> LN -> matmul -> act."""
    t32 = x.astype(jnp.float32) + delta.astype(jnp.float32)
    t = t32.astype(x.dtype)
    mean = jnp.mean(t32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(t32 * t32, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (t32 - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    out = jnp.dot(xn.astype(w.dtype), w, preferred_element_type=jnp.float32)
    out = out + b.astype(jnp.float32)
    out = _ACTIVATIONS[activation](out)
    return t, out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _add_ln_matmul(x, delta, scale, bias, w, b, eps, activation):
    interpret = jax.default_backend() == "cpu"
    return _add_ln_matmul_fwd_3d(x, delta, scale, bias, w, b, eps,
                                 activation, interpret)


def _add_ln_matmul_fwd(x, delta, scale, bias, w, b, eps, activation):
    return (_add_ln_matmul(x, delta, scale, bias, w, b, eps, activation),
            (x, delta, scale, bias, w, b))


def _add_ln_matmul_bwd(eps, activation, res, g):
    x, delta, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda x, delta, scale, bias, w, b: add_ln_matmul_reference(
            x, delta, scale, bias, w, b, eps=eps, activation=activation),
        x, delta, scale, bias, w, b)
    return vjp(g)


_add_ln_matmul.defvjp(_add_ln_matmul_fwd, _add_ln_matmul_bwd)


def add_ln_matmul(x, delta, scale, bias, w, b, *, eps: float = 1e-5,
                  gelu: bool = False, activation: str | None = None,
                  impl: str = "auto"):
    """(x + delta, act(LN(x + delta) @ w + b)) over the last axis.

    The pre-LN residual block's second half in one HBM pass: the residual
    add, the LN statistics, the matmul, and the activation all happen on
    the VMEM-resident tile.  ``activation``: None | 'quick_gelu' (CLIP) |
    'gelu_exact' (DINO); ``gelu=True`` is shorthand for 'quick_gelu'.
    """
    if gelu and activation is None:
        activation = "quick_gelu"
    k = x.shape[-1]
    m = w.shape[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = "pallas" if (on_tpu and supports_ln_matmul(k, m)) else "reference"
    if impl == "pallas" and x.ndim == 3:
        return _add_ln_matmul(x, delta, scale, bias, w, b, eps, activation)
    return add_ln_matmul_reference(x, delta, scale, bias, w, b, eps=eps,
                                   activation=activation)


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "interpret",
                                             "activation"))
def _ln_matmul_fwd_3d(x, w, b, eps, block_b, interpret,
                      activation=None):
    """3D entry: x [B, S, K] -> [B, S, M], grid over the batch dim.

    Avoids the [B, S, K] -> [B*S, K] reshape a 2D kernel would force: with
    S not a multiple of the sublane tile (ViT's S=197), that reshape is a
    real repacking pass (measured +81 ms at bs512 across 24 call sites).
    """
    bsz, s, k = x.shape
    m = w.shape[1]
    g = 4 if bsz % 4 == 0 else (2 if bsz % 2 == 0 else 1)
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel_3d, eps=eps,
                          activation=activation),
        grid=(bsz // g,),
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * k * m,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + bsz * s * m * x.dtype.itemsize),
            transcendentals=bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, w, b)
    return out


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret",
                                             "activation"))
def _ln_matmul_fwd_impl(x, w, b, eps, block_n, interpret,
                        activation=None):
    n, k = x.shape
    m = w.shape[1]
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps, activation=activation),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # constant index map: Mosaic keeps W resident across grid steps
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * m,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + n_pad * m * x.dtype.itemsize),
            transcendentals=n_pad * m if activation else 0,
        ),
        interpret=interpret,
    )(x, w, b)
    return out[:n] if n_pad != n else out


def _raw_ln_matmul_reference(x, w_eff, b_eff, *, eps, activation):
    """jnp twin of the post-fold kernel form, for the custom_vjp."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_eff.dtype)
    out = jnp.dot(xn, w_eff, preferred_element_type=jnp.float32)
    out = _ACTIVATIONS[activation](out + b_eff.astype(jnp.float32))
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_matmul(x, w_eff, b_eff, eps, activation):
    interpret = jax.default_backend() == "cpu"
    if x.ndim == 3:
        return _ln_matmul_fwd_3d(x, w_eff, b_eff, eps, 1, interpret,
                                 activation)
    return _ln_matmul_fwd_impl(x, w_eff, b_eff, eps, 256, interpret,
                               activation)


def _ln_matmul_fwd(x, w_eff, b_eff, eps, activation):
    return (_ln_matmul(x, w_eff, b_eff, eps, activation),
            (x, w_eff, b_eff))


def _ln_matmul_bwd(eps, activation, res, g):
    x, w_eff, b_eff = res
    _, vjp = jax.vjp(
        lambda x, w_eff, b_eff: _raw_ln_matmul_reference(
            x, w_eff, b_eff, eps=eps, activation=activation),
        x, w_eff, b_eff)
    return vjp(g)


_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def supports_ln_matmul(k: int, m: int) -> bool:
    """Kernel engages only for MXU-friendly shapes that fit VMEM:
    lane dims multiples of 128 and a resident [K, M] weight block."""
    return k % 128 == 0 and m % 128 == 0 and k * m * 2 <= 8 * 1024 * 1024


def ln_matmul(x, scale, bias, w, b, *, eps: float = 1e-5,
              activation: str | None = None, impl: str = "auto"):
    """act(LayerNorm(x) @ w + b) over the last axis of x.

    x: [..., K] (any leading dims); scale/bias: [K]; w: [K, M]; b: [M].
    ``activation``: None | 'quick_gelu' (CLIP) | 'gelu_exact' (DINO).
    impl: 'auto' (Pallas on TPU for supported shapes, else reference) |
    'pallas' | 'reference'.
    """
    k = x.shape[-1]
    m = w.shape[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = "pallas" if (on_tpu and supports_ln_matmul(k, m)) else "reference"
    if impl == "pallas" and x.ndim in (2, 3):
        # keep the caller's rank: a [B, S, K] -> [B*S, K] reshape is a real
        # repacking pass on TPU when S is not sublane-aligned
        from uml_tpu.ops.fused_attention import fold_ln_into_matmul

        w_eff, b_eff = fold_ln_into_matmul(scale, bias, w, b)
        return _ln_matmul(x, w_eff, b_eff, eps, activation)
    return ln_matmul_reference(x, scale, bias, w, b, eps=eps,
                               activation=activation)
