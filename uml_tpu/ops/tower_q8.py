"""Whole-tower W8A8 kernel: all L full transformer layers of the int8
serving forward in ONE Pallas program.

The per-layer int8 path (ops.quant: ln_attn_block_q8 + ln_mlp_block_q8)
captures 77-78% of its measured speed of light at the ViT-B/16 serving
shape (bs2048, S=197, K=768) across rounds 3-5, and the r5 half-block
micro A/Bs (group-flat out-proj, MLP slab chunking —
tools/exp_q8_slab2.py) were washes or losses: the remaining gap is not
inside the half-block kernels.  What the per-layer path still pays is
COMPOSITION: 2L dispatch barriers and 2L HBM round-trips of the
[B, S, K] residual stream (~620 MB per direction at bs2048).  This
kernel applies the same move that took the bf16 text tower from 70% to
~80% of its roofline (ops.text_tower): grid (batch_groups, layers), the
residual stream VMEM-resident in the output block across all L layers,
per-layer int8 weights + fp32 scales streamed along the layer grid axis
(Mosaic double-buffers the next layer's ~7.1 MB int8 fetch under the
current layer's compute).

Numerics are the per-layer int8 path's exactly: same
_ln_quantize_rows / _q8_dot / _act_quantize_rows chains over the same
rows, same per-image attention math (_pair_attention), and the same
bf16 residual round-trip between half-blocks and between layers that
the per-layer path pays through HBM.  Inference-only (the int8 serving
mode has no training path — ops/quant.py).

Reference analog: none (the reference serves fp16 through stock torch,
engine/clip/model.py:381-402); net-new TPU-first serving structure.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uml_tpu.ops.fused_attention import (VMEM_CEILING, _packed_enabled,
                                         _pair_attention)
from uml_tpu.ops.ln_matmul import _KERNEL_ACTIVATIONS
from uml_tpu.ops.quant import (_act_quantize_rows, _ln_quantize_rows,
                               _q8_dot, _quantize_rows)

__all__ = ["tower_q8", "supports_tower_q8", "tower_q8_reference"]


def _tower_q8_kernel(x_ref, wq_ref, wsc_ref, b_ref, woq_ref, wosc_ref,
                     bo_ref, w1q_ref, w1sc_ref, b1_ref, w2q_ref, w2sc_ref,
                     b2_ref, o_ref, *, eps, heads, head_dim, activation,
                     dot_dtype):
    """One (batch-group, layer) grid step: int8 attention half + int8 MLP
    half for G images, the group's residual stream resident in o_ref
    (seeded from x_ref at layer 0, flushed to HBM once per group).

    The QKV and MLP projections run group-flat int8 slabs ([G*S, *] rows
    — int8's 32-sublane tile pads a per-image S=197 dot 12%, the slab
    ~1.5%); scores/softmax/PV and the out-projection stay per image,
    mirroring ops.quant._block_q8_kernel (the group-flat out-proj was
    A/B'd and retired, tools/exp_q8_slab2.py)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = x_ref[...]

    g, s, k = o_ref.shape

    # ---- attention half: o = o + (MHA(rawLN(o) @int8 w + b) @int8 wo + bo)
    xf_all = o_ref[...].reshape(g * s, k).astype(jnp.float32)
    xq, xs = _ln_quantize_rows(xf_all, eps)
    qkv_all = _q8_dot(xq, xs, wq_ref[0], wsc_ref[0, 0]).astype(dot_dtype)
    outs = []
    for jj in range(g):
        cols = _pair_attention(qkv_all[jj * s:(jj + 1) * s], heads=heads,
                               head_dim=head_dim, causal=False,
                               dot_dtype=dot_dtype, b_eff=b_ref[0, 0])
        attn = jnp.concatenate(cols, axis=-1)               # fp32 [S, H*D]
        aq, asc = _quantize_rows(attn)
        outs.append(_q8_dot(aq, asc, woq_ref[0], wosc_ref[0, 0]))
    delta = jnp.concatenate(outs, axis=0)
    # bf16 round-trip between halves: the per-layer path stores the
    # half-block output to HBM in the residual dtype — parity kept
    o = (xf_all + delta + bo_ref[0, 0].astype(jnp.float32)
         ).astype(o_ref.dtype).astype(jnp.float32)

    # ---- MLP half: o = o + act(rawLN(o) @int8 w1 + b1) @int8 w2 + b2
    xq, xs = _ln_quantize_rows(o, eps)
    pre = _q8_dot(xq, xs, w1q_ref[0], w1sc_ref[0, 0])
    yq, ys = _act_quantize_rows(pre + b1_ref[0, 0].astype(jnp.float32),
                                activation, _KERNEL_ACTIVATIONS)
    out = _q8_dot(yq, ys, w2q_ref[0], w2sc_ref[0, 0])
    out = o + out + b2_ref[0, 0].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype).reshape(g, s, k)


def tower_q8_vmem_bytes(k, m3, m, hd, s, g, itemsize=2):
    """Working set: double-buffered per-layer int8 weights + fp32
    scales/biases, the group's resident residual block (+ x in), the
    group-flat int8/fp32 quantize-dot temporaries, and the per-image
    score/attention-output temps."""
    rows = g * s
    weights = (k * m3 + hd * k + k * m + m * k) * 2        # int8, db
    scales = 4 * (2 * m3 + 3 * k + 2 * m) * 2              # fp32, db
    acts = 3 * g * s * k * itemsize                        # o resident + x
    temps = rows * (4 * k + k                              # xf fp32 + xq
                    + 4 * m3 + itemsize * m3               # qkv fp32 + cast
                    + 4 * k                                # attn-out fp32
                    + 4 * m + m                            # pre fp32 + yq
                    + 4 * k)                               # mlp out fp32
    temps += s * (4 * hd + hd)                             # per-image attn q8
    scores = s * s * (4 + 2) * (2 if _packed_enabled() else 1)
    return weights + scales + acts + temps + scores


def _tower_q8_g(bsz, k, m3, m, hd, s, itemsize):
    g = int(os.environ.get("UML_TOWER_Q8_G", "4"))
    while g > 1 and bsz % g != 0:
        g //= 2
    while (g > 1
           and tower_q8_vmem_bytes(k, m3, m, hd, s, g, itemsize) * 1.6
           > VMEM_CEILING):
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "activation", "interpret", "g"))
def _tower_q8_fwd(x, wq, wsc, b_eff, woq, wosc, bo, w1q, w1sc, b1,
                  w2q, w2sc, b2, eps, heads, head_dim, activation,
                  interpret, g):
    bsz, s, k = x.shape
    layers, _, m3 = wq.shape
    m = w1q.shape[2]
    hd = heads * head_dim
    # scales/biases ride as [L, 1, W]: the (1, 1, W) block's trailing two
    # dims then equal the array's (Mosaic's real-lowering block rule)
    wsc, b_eff, wosc, bo, w1sc, b1, w2sc, b2 = (
        a[:, None] for a in (wsc, b_eff, wosc, bo, w1sc, b1, w2sc, b2))
    need = tower_q8_vmem_bytes(k, m3, m, hd, s, g, x.dtype.itemsize)
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need * 1.6) + 2**21, VMEM_CEILING))

    def w_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda i, j: (j,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_tower_q8_kernel, eps=eps, heads=heads,
                          head_dim=head_dim, activation=activation,
                          dot_dtype=jnp.bfloat16),
        grid=(bsz // g, layers),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec((k, m3)), w_spec((1, m3)), w_spec((1, m3)),
            w_spec((hd, k)), w_spec((1, k)), w_spec((1, k)),
            w_spec((k, m)), w_spec((1, m)), w_spec((1, m)),
            w_spec((m, k)), w_spec((1, k)), w_spec((1, k)),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * layers * (k * m3 + hd * k + 2 * k * m
                                          + 2 * s * hd),
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + wq.size + woq.size + w1q.size + w2q.size),
            transcendentals=bsz * s * layers * (m + s),
        ),
        interpret=interpret,
    )(x, wq, wsc, b_eff, woq, wosc, bo, w1q, w1sc, b1, w2q, w2sc, b2)


def tower_q8_reference(x, wq, wsc, b_eff, woq, wosc, bo, w1q, w1sc, b1,
                       w2q, w2sc, b2, *, heads, eps=1e-5,
                       activation="quick_gelu"):
    """jnp twin (simulated int8, prequantized weights): the per-layer
    reference chains composed over the stacked weights — the CPU path
    and the test oracle.  Matches ops.quant's references' math exactly,
    including the bf16 residual round-trips between half-blocks."""
    from uml_tpu.ops.ln_matmul import _ACTIVATIONS

    d = wq.shape[2] // (3 * heads)

    def layer(c, wl):
        (wq_, wsc_, b_, woq_, wosc_, bo_, w1q_, w1sc_, b1_,
         w2q_, w2sc_, b2_) = wl
        b, s, k = c.shape
        xf = c.astype(jnp.float32).reshape(b * s, k)
        xq, xs = _ln_quantize_rows(xf, eps)
        qkv = (_q8_dot(xq, xs, wq_, wsc_)
               .reshape(b, s, -1) + b_.astype(jnp.float32))
        qkv = qkv.astype(jnp.bfloat16)
        qkv = qkv.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
        from uml_tpu.ops.attention import mha_reference

        attn = mha_reference(qkv[0], qkv[1], qkv[2], causal=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b * s, heads * d)
        aq, asc = _quantize_rows(attn.astype(jnp.float32))
        delta = _q8_dot(aq, asc, woq_, wosc_)
        o = (xf + delta + bo_.astype(jnp.float32)
             ).astype(c.dtype).astype(jnp.float32)
        xq, xs = _ln_quantize_rows(o, eps)
        pre = _q8_dot(xq, xs, w1q_, w1sc_)
        yq, ys = _act_quantize_rows(pre + b1_.astype(jnp.float32),
                                    activation, _ACTIVATIONS)
        out = _q8_dot(yq, ys, w2q_, w2sc_)
        out = (o + out + b2_.astype(jnp.float32)).astype(c.dtype)
        return out.reshape(b, s, k), None

    out, _ = jax.lax.scan(
        layer, x, (wq, wsc, b_eff, woq, wosc, bo, w1q, w1sc, b1,
                   w2q, w2sc, b2))
    return out


def supports_tower_q8(k: int, heads: int, head_dim: int, s: int,
                      m: int, itemsize: int = 2) -> bool:
    """Head-pair mode constraints and the G=1 working set must fit."""
    if head_dim * 2 != 128 or heads % 2 != 0 or k % 128 != 0 or m % 128 != 0:
        return False
    return tower_q8_vmem_bytes(k, 3 * heads * head_dim, m,
                               heads * head_dim, s, 1,
                               itemsize) * 1.6 <= VMEM_CEILING


def tower_q8(x, wq, wsc, b_eff, woq, wosc, bo, w1q, w1sc, b1,
             w2q, w2sc, b2, *, heads: int, eps: float = 1e-5,
             activation: str = "quick_gelu", impl: str = "auto"):
    """x [B,S,K] through L W8A8 pre-LN transformer layers in one Pallas
    program.  Weights are stacked per layer, LN-folded and PRE-QUANTIZED
    (ops.quant.quantize_weight on the fp32 folded weights — the same
    fold+quantize the per-layer path runs):

      wq   int8 [L,K,3HD], wsc fp32 [L,3HD], b_eff fp32 [L,3HD]
      woq  int8 [L,HD,K],  wosc fp32 [L,K],  bo fp32 [L,K]
      w1q  int8 [L,K,M],   w1sc fp32 [L,M],  b1 fp32 [L,M]
      w2q  int8 [L,M,K],   w2sc fp32 [L,K],  b2 fp32 [L,K]
    """
    k = x.shape[-1]
    m = w1q.shape[2]
    d = wq.shape[2] // (3 * heads)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3
                and supports_tower_q8(k, heads, d, x.shape[1], m)
                else "reference")
    if impl == "pallas":
        interpret = jax.default_backend() == "cpu"
        g = _tower_q8_g(x.shape[0], k, wq.shape[2], m, heads * d,
                        x.shape[1], x.dtype.itemsize)
        return _tower_q8_fwd(x, wq, wsc, b_eff, woq, wosc, bo,
                             w1q, w1sc, b1, w2q, w2sc, b2,
                             eps, heads, d, activation, interpret, g)
    return tower_q8_reference(x, wq, wsc, b_eff, woq, wosc, bo,
                              w1q, w1sc, b1, w2q, w2sc, b2,
                              heads=heads, eps=eps, activation=activation)
