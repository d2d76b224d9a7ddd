"""Whole-text-tower fused kernel: all L transformer layers in ONE Pallas
program, activations VMEM-resident across layers, weights streamed.

The per-layer two-kernel path (ops.fused_attention.ln_attn_block +
ops.ln_matmul.ln_mlp_block) measured 69-70% of the text tower's analytic
roofline at CLIP's S=77/K=512 shape (COVERAGE.md round-4): with only
~0.42 GF per sentence-layer, the 24 per-layer dispatch barriers and the
2 x [B,S,K] HBM round-trips of the residual stream per layer dominate.
This kernel runs the grid (batch_groups, layers): the residual stream
lives in the OUTPUT block's VMEM for all L layers of a group (one HBM
read of x, one write of the result), and the per-layer folded weights
are streamed via BlockSpec index maps on the layer axis — Mosaic
double-buffers the next layer's ~6.3 MB (ViT-B text) weight fetch under
the current layer's compute, so the stream rides the same HBM bandwidth
the two-kernel path spent on activations.

Numerics are the two-kernel path's exactly (raw LN folded into the
matmuls, head-pair causal attention, group-flat projections); the
backward falls back to jax.vjp over the jnp twin (the supervised
finetune never trains the text tower — reference finetune.py freezes it
and precomputes text features — so the tower kernel is a forward/
extraction surface).

Reference analog: none (the reference's text tower is stock torch
nn.MultiheadAttention layers, engine/clip/model.py); this is TPU-first
net-new structure.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uml_tpu.ops.fused_attention import (
    VMEM_CEILING,
    _pair_attention,
    _raw_block_reference,
)
from uml_tpu.ops.ln_matmul import _KERNEL_ACTIVATIONS, _raw_mlp_block_reference

__all__ = ["text_tower", "supports_text_tower", "text_tower_reference"]


def _tower_kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                  eps, heads, head_dim):
    """One (batch-group, layer-block) grid step: attention half + MLP
    half for G entries and LB consecutive layers, reading and writing
    the group's residual stream in o_ref (seeded from x_ref at layer 0).
    o_ref's block index is constant in the layer axis, so the block
    stays VMEM-resident across layers and flushes to HBM once per group.

    Projections are GROUP-FLAT: LN/QKV/out-proj/MLP all run over the
    [G*S, *] row space in single dots (G=8 -> 616 rows = 96% MXU
    row-tile fill), not per entry — at S=77 a per-entry [77, K] dot
    fills only 60% of the 128-row tile, and the same-window sweep read
    the per-entry body at G8/16/32 = 23958/20637/22030 sent/s (flat to
    WORSE with G: row fill, not weight streaming, binds).  Only the
    [S, S] causal score/softmax math stays per entry (0.3 of the 5
    GF/sentence).

    LB > 1 (UML_TEXT_TOWER_LB) runs several layers per grid step —
    fewer grid-step boundaries at G=8/L=12's 3072 steps — while the
    layer-axis weight stream double-buffers LB layers at a time.
    MEASURED (r5 same-window, tools/exp_text_tower.py): LB1 25.9k |
    LB2 20.9k | LB3 23.1k | LB4 23.7k | LB6 24.3k sent/s — multi-layer
    blocks degrade the weight-stream double-buffering more than the
    saved step boundaries return; LB=1 stays the default."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = x_ref[...]

    g, s, k = o_ref.shape
    lb = w_ref.shape[0]

    o = o_ref[...].reshape(g * s, k).astype(jnp.float32)
    for l in range(lb):
        # attention half: o = o + MHA(rawLN(o) @ w + b) @ wo + bo
        # (biases ride as [L, 1, W] so the bias block's trailing two dims
        # equal the array's — Mosaic's block-shape rule for real lowering)
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(o * o, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((o - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
        qkv = jnp.dot(xn, w_ref[l],
                      preferred_element_type=jnp.float32).astype(w_ref.dtype)
        # per-entry scores/softmax (qkv bias rides _pair_attention's
        # masked FMAs; the k-bias is softmax-invariant and dropped there)
        attn = jnp.concatenate([
            jnp.concatenate(
                _pair_attention(qkv[jj * s:(jj + 1) * s], heads=heads,
                                head_dim=head_dim, causal=True,
                                dot_dtype=w_ref.dtype, b_eff=b_ref[l, 0]),
                axis=-1)
            for jj in range(g)], axis=0).astype(wo_ref.dtype)
        delta = jnp.dot(attn, wo_ref[l], preferred_element_type=jnp.float32)
        # round-trip through the residual dtype between halves and
        # between layers: the two-kernel path stores x to HBM at each
        # kernel boundary, and the jnp twin mirrors that cast —
        # bit-parity kept
        o = (o + delta + bo_ref[l, 0].astype(jnp.float32)
             ).astype(o_ref.dtype).astype(jnp.float32)

        # MLP half: o = o + act(rawLN(o) @ w1 + b1) @ w2 + b2, group-flat
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(o * o, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((o - mean) * jax.lax.rsqrt(var + eps)).astype(w1_ref.dtype)
        y = jnp.dot(xn, w1_ref[l], preferred_element_type=jnp.float32)
        y = _KERNEL_ACTIVATIONS["quick_gelu"](
            y + b1_ref[l, 0].astype(jnp.float32)).astype(w2_ref.dtype)
        out = jnp.dot(y, w2_ref[l], preferred_element_type=jnp.float32)
        o = (out + o + b2_ref[l, 0].astype(jnp.float32)
             ).astype(o_ref.dtype).astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype).reshape(g, s, k)


def _tower_vmem_bytes(k, m3, m, hd, s, g, itemsize, lb=1):
    """Working-set estimate: double-buffered per-layer-block weights +
    the group's resident residual block (+ x in, double-buffered on the
    group axis) + the group-flat fp32/bf16 temporaries ([G*S, *] xf,
    qkv, attn, y)."""
    weights = (k * m3 + hd * k + k * m + m * k) * itemsize * 2 * lb
    acts = 3 * g * s * k * itemsize          # o resident + x (db)
    temps = g * s * (4 * 2 * k              # xf + o fp32
                     + 4 * m3 + itemsize * m3   # qkv fp32 + cast
                     + 4 * hd                   # attn cols fp32
                     + 4 * m + itemsize * m)    # y fp32 + cast
    return weights + acts + temps


def _tower_g(bsz, k, m3, m, hd, s, itemsize):
    g = int(os.environ.get("UML_TEXT_TOWER_G", "8"))
    while g > 1 and bsz % g != 0:
        g //= 2
    # gate at the SLACKED footprint (the same 1.6x _tower_fwd requests):
    # the old-kernel G=64 probe OOM'd scoped VMEM with a 1.3x request
    # (40.09M actual vs 38.30M limit) — Mosaic's stack allocation runs
    # ~where the estimate says but needs real headroom
    while (g > 1
           and _tower_vmem_bytes(k, m3, m, hd, s, g, itemsize) * 1.6
           > VMEM_CEILING):
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "interpret", "g", "lb"))
def _tower_fwd(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
               eps, heads, head_dim, interpret, g, lb=1):
    # g (batch group per program) and lb (layers per grid step) are
    # STATIC jit args resolved by the caller (_tower reads
    # UML_TEXT_TOWER_G / UML_TEXT_TOWER_LB) so the jit cache keys on
    # them — an env read inside the traced body would silently pin the
    # first-traced value for every later call of the same shape
    bsz, s, k = x.shape
    layers, _, m3 = w_eff.shape
    m = w1.shape[2]
    hd = heads * head_dim
    # biases as [L, 1, W]: a (1, 1, W) block's trailing dims then equal
    # the array's, satisfying Mosaic's real-lowering block-shape rule
    # (interpret mode accepts (1, W) over [L, W]; the chip does not)
    b_eff, bo, b1, b2 = (a[:, None] for a in (b_eff, bo, b1, b2))
    need = _tower_vmem_bytes(k, m3, m, hd, s, g, x.dtype.itemsize, lb)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need * 1.6) + 2**21, VMEM_CEILING))
    return pl.pallas_call(
        functools.partial(_tower_kernel, eps=eps, heads=heads,
                          head_dim=head_dim),
        grid=(bsz // g, layers // lb),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, k, m3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, m3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, hd, k), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, k), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, k, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, m, k), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, k), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * layers * (k * m3 + hd * k + 2 * k * m
                                          + 2 * s * hd),
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + (w_eff.size + wo.size + w1.size + w2.size)
                            * w_eff.dtype.itemsize),
            transcendentals=bsz * s * layers * (m + s),
        ),
        interpret=interpret,
    )(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2)


def text_tower_reference(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2, *,
                         heads, eps=1e-5):
    """jnp twin (post-fold form): the per-layer two-kernel references
    composed over the stacked weights — used for the custom_vjp backward
    and CPU tests."""
    def layer(x, wl):
        w, b, wo_, bo_, w1_, b1_, w2_, b2_ = wl
        x = _raw_block_reference(x, w, b, wo_, bo_, heads=heads,
                                 causal=True, eps=eps)
        return _raw_mlp_block_reference(x, w1_, b1_, w2_, b2_, eps=eps,
                                        activation="quick_gelu"), None

    out, _ = jax.lax.scan(
        lambda c, wl: layer(c, wl), x,
        (w_eff, b_eff, wo, bo, w1, b1, w2, b2))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _tower(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2, heads, head_dim, eps):
    interpret = jax.default_backend() == "cpu"
    bsz, s, k = x.shape
    g = _tower_g(bsz, k, w_eff.shape[2], w1.shape[2],
                 heads * head_dim, s, x.dtype.itemsize)
    layers = w_eff.shape[0]
    lb = int(os.environ.get("UML_TEXT_TOWER_LB", "1"))
    while lb > 1 and layers % lb != 0:
        lb -= 1
    return _tower_fwd(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
                      eps, heads, head_dim, interpret, g, lb)


def _tower_vjp_fwd(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
                   heads, head_dim, eps):
    return (_tower(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
                   heads, head_dim, eps),
            (x, w_eff, b_eff, wo, bo, w1, b1, w2, b2))


def _tower_vjp_bwd(heads, head_dim, eps, res, g):
    # extraction surface: the text tower is frozen in every reference
    # training path, so the backward (only reachable if a caller
    # differentiates through encode_text) recomputes via the jnp twin
    x, w_eff, b_eff, wo, bo, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: text_tower_reference(*a, heads=heads, eps=eps),
        x, w_eff, b_eff, wo, bo, w1, b1, w2, b2)
    return vjp(g)


_tower.defvjp(_tower_vjp_fwd, _tower_vjp_bwd)


def supports_text_tower(k: int, heads: int, head_dim: int, s: int,
                        m: int, itemsize: int = 2) -> bool:
    """Head-pair mode constraints (D=64, even heads, lane-aligned K) and
    the G=1 working set must fit VMEM."""
    if head_dim * 2 != 128 or heads % 2 != 0 or k % 128 != 0:
        return False
    return _tower_vmem_bytes(k, 3 * heads * head_dim, m,
                             heads * head_dim, s, 1, itemsize) <= VMEM_CEILING


def text_tower(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2, *,
               heads: int, eps: float = 1e-5, impl: str = "auto"):
    """x [B,S,K] through L pre-LN causal transformer layers in one Pallas
    program.  Weights are stacked per layer with the LN params already
    folded (ops.fused_attention.fold_ln_into_matmul):

      w_eff [L,K,3HD], b_eff [L,3HD]  — ln_1-folded QKV
      wo [L,HD,K], bo [L,K]           — attention out-projection
      w1 [L,K,M], b1 [L,M]            — ln_2-folded c_fc (M = 4K)
      w2 [L,M,K], b2 [L,K]            — c_proj
    """
    k = x.shape[-1]
    m = w1.shape[2]
    d = w_eff.shape[2] // (3 * heads)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3
                and supports_text_tower(k, heads, d, x.shape[1], m)
                else "reference")
    if impl == "pallas":
        return _tower(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
                      heads, d, eps)
    return text_tower_reference(x, w_eff, b_eff, wo, bo, w1, b1, w2, b2,
                                heads=heads, eps=eps)
