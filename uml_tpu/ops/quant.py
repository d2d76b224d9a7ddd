"""Int8 (W8A8) inference kernels for the transformer half-blocks.

Serving-oriented quantized twins of ops.fused_attention.ln_attn_block and
ops.ln_matmul.ln_mlp_block: the projection matmuls (QKV, out-proj, MLP
fc1/fc2 — ~92% of a ViT forward's FLOPs) run as int8 x int8 -> int32 MXU
dots, which the v5e executes at 394 TOPS vs 197 TFLOPs bf16 — a 2x
physics ceiling over the bf16 extraction roofline this framework already
measures at ~87%.  Everything shape-sensitive about accuracy stays in
high precision: LN statistics fp32, attention scores/softmax/PV exactly
the bf16 kernels' math, bias adds and the GELU epilogue fp32.

Quantization scheme (no calibration pass needed):
  * weights: symmetric per-OUTPUT-CHANNEL int8, quantized in-graph from
    the LN-folded fp32 weights (one tiny XLA pass per layer per forward,
    hoistable by the caller; never per grid program);
  * activations: symmetric per-ROW dynamic int8 — the kernel already owns
    the fp32 LN output row in VMEM, so the absmax reduce + scale + round
    are three VPU passes with zero extra HBM traffic.  Per-row dynamic
    scales are the LLM.int8()-style robust choice: no calibration data,
    no static-range tuning, exact for the worst row of every batch.
  * dequant: dot(q_x * s_row, q_w * s_col) == (s_row x s_col) * dot(q_x,
    q_w) — an exact rank-1 fp32 epilogue on the int32 accumulator.

Rounding is floor(x + 0.5) (round-half-up): identical, branch-free code
in the Mosaic kernel, the jnp reference, and the interpret path, so all
three agree bit-for-bit on the quantized integers.

Inference-only by design: the backward of a quantized op is the float
op's backward in any straight-through scheme, so training paths keep the
bf16 kernels (which have hand-written Pallas backwards).  The reference
has no quantized path at all (fp16 CUDA via torch, engine/clip/model.py:
381-402); this module is net-new serving capability.  Scheme background:
post-training W8A8 with dynamic activation quantization is the standard
low-risk recipe for ViTs (see "Model Quantization and Hardware
Acceleration for Vision Transformers: A Comprehensive Survey",
arXiv:2405.00314 — PAPERS.md); per-row/per-channel symmetric scales are
the outlier-robust variant of it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uml_tpu.ops.fused_attention import (VMEM_CEILING, _default_fwd_g,
                                         _group_and_params, _packed_enabled,
                                         _pair_attention, fold_ln_into_matmul)
from uml_tpu.ops.ln_matmul import _KERNEL_ACTIVATIONS

INT8_MAX = 127.0


def _round_half_up(x):
    """Branch-free round-half-up: identical lowering in Mosaic, XLA, and
    the interpret path (jnp.rint's round-half-even is not guaranteed a
    Mosaic lowering on every jaxlib)."""
    return jnp.floor(x + 0.5)


def quantize_weight(w):
    """fp weight [K, M] -> (int8 [K, M], fp32 col scales [M]).

    Symmetric per-output-channel: scale_m = absmax(w[:, m]) / 127.
    Runs as a tiny XLA pass (3 elementwise/reduce ops over the weight);
    jit CSE evaluates it once per layer per compiled forward.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    q = jnp.clip(_round_half_up(wf / scale[None, :]),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def _quantize_rows(xf):
    """fp32 activations [S, K] -> (int8 [S, K], fp32 row scales [S, 1])."""
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    q = jnp.clip(_round_half_up(xf / scale),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def _ln_quantize_rows(xf, eps):
    """Fused LN + per-row quantize: fp32 [S, K] -> (int8, fp32 scales).

    Replaces _quantize_rows(_ln_rows(x)) without ever materializing the
    normalized fp32 row: absmax(xn) == rstd * max(max(x) - mean,
    mean - min(x)) — the max/min reduce rides the same resident data as
    the mean/E[x^2] reduces, and the quantized integer comes from ONE
    fused (x - mean) * (rstd / scale) pass instead of normalize-then-
    divide.  Numerics: same values up to fp32 multiply-order (the jnp
    references use this same function, so kernel == reference stays
    bit-for-bit); vs the unfused form an exact-tie at the round boundary
    can flip one integer step — within the quantization error budget by
    construction.
    """
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mx = jnp.max(xf, axis=-1, keepdims=True)
    mn = jnp.min(xf, axis=-1, keepdims=True)
    absmax = jnp.maximum(mx - mean, mean - mn) * rstd
    scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    k = rstd / scale
    q = jnp.clip(_round_half_up((xf - mean) * k),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


# |global minimum| of each activation's negative lobe: quick_gelu
# x*sigmoid(1.702x) bottoms at -0.1637 (x ~ -0.751), exact GELU x*Phi(x)
# at -0.1700 (x ~ -0.752); constants padded ~1% so the bound can never
# under-cover the lobe (an under-estimated scale would CLIP, an
# over-estimate only coarsens near-zero rows)
_ACT_NEG_LOBE = {"quick_gelu": 0.1654, "gelu_exact": 0.1718}


def _act_quantize_rows(pre, activation, act_table):
    """Quantize act(pre) per row without materializing act(pre) or
    reducing over it: for the bounded-lobe GELUs, act is monotone
    increasing above its global-minimum point and its negative values
    are bounded by the lobe constant, so
        absmax(act(pre_row)) <= max(act(max(pre_row)), lobe)
    with equality whenever the row max is the true absmax.  The row
    reduce runs over ``pre`` (already VMEM-resident from the dot), and
    the activation+scale+round+cast fuse into ONE elementwise pass —
    the old path materialized act(pre), reduced over it, then re-read
    it to quantize (three hidden-width [rows, 4K] passes).  The scale
    never under-covers, so nothing clips; rows whose true absmax sits
    on the negative lobe quantize slightly coarser (bounded absolute
    error ~lobe/127).  ``act_table`` lets the Mosaic kernel and the jnp
    reference pass their own activation implementations so each stays
    self-consistent."""
    act = act_table[activation]
    if activation not in _ACT_NEG_LOBE:
        return _quantize_rows(act(pre))
    row_max = jnp.max(pre, axis=-1, keepdims=True)
    amax = jnp.maximum(act(row_max), _ACT_NEG_LOBE[activation])
    scale = amax / INT8_MAX
    q = jnp.clip(_round_half_up(act(pre) / scale),
                 -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def _q8_dot(xq, row_scale, wq, col_scale):
    """(int8 [S, K] x int8 [K, M]) -> fp32 [S, M] with the exact rank-1
    dequant epilogue.  The dot accumulates in int32 on the MXU (v5e: 2x
    the bf16 rate); K <= 4096 x |q| <= 127^2 stays far inside int32."""
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * row_scale * col_scale[None, :]


def _ln_rows(xf, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (xf - mean) * jax.lax.rsqrt(var + eps)


def _block_q8_kernel(x_ref, wq_ref, wsc_ref, b_ref, *refs, eps, heads,
                     head_dim, causal, dot_dtype, slab, q8_out):
    """Int8 twin of fused_attention._block_kernel: o = x + (MHA(rawLN(x)
    @int8 w + b) @ wo + bo).  The QKV dot always runs int8 on the MXU;
    the per-head-pair attention math (scores, exp2 softmax, PV) is
    byte-identical to the bf16 kernel — it reuses _pair_attention.

    ``q8_out`` (static): the out-projection runs int8 too (the serving
    default; refs are woq/wosc/bo/o).  ``q8_out=False`` is the qkv-only
    higher-fidelity mode — the out-projection stays bf16 (refs are
    wo/bo/o), skipping the [S, H*D] attention-output quantize.  A/B
    verdict (tools/exp_q8_mix.py, v5e bs2048): full int8 6553.8 img/s vs
    qkv-only 6437.0 — the out-proj's int8 MXU saving beats its quantize
    overhead once composed, so the default keeps both projections int8.

    ``slab``: run the QKV projection as ONE [G*S, K] int8 dot.  int8
    operands tile at 32 sublanes (vs 8 for bf16), so a per-image S=197
    dot pads to 224 rows — 12% dead MXU cycles; the G*S slab amortizes
    the pad to ~1.5%.  Row quantization is per-row either way, so the
    slab is numerically identical.  Attention and the out-proj stay
    per-image (scores are per-image; the out-proj is 1/3 the QKV FLOPs)."""
    if q8_out:
        woq_ref, wosc_ref, bo_ref, o_ref = refs
    else:
        wo_ref, bo_ref, o_ref = refs
    g, s, k = x_ref.shape
    if slab:
        xf_all = x_ref[:].reshape(g * s, k).astype(jnp.float32)
        xq, xs = _ln_quantize_rows(xf_all, eps)
        qkv_all = _q8_dot(xq, xs, wq_ref[:], wsc_ref[:]).astype(dot_dtype)
    # NOTE r5: a group-flat out-projection ([G*S, HD] x [HD, K] in one
    # dot, amortizing the per-image 13.7% int8 row-tile pad) was
    # implemented and A/B'd composed — 6415 vs 6439 img/s per-image in
    # the same episode (tools/exp_q8_slab2.py): a wash.  MLP slab
    # chunking (UML_Q8_MLP_SLAB) measured WORSE (6244/6277).  Both
    # retired; the kernel keeps the per-image out-proj r4 shipped.
    for j in range(g):
        if slab:
            xf = xf_all[j * s:(j + 1) * s]
            qkv = qkv_all[j * s:(j + 1) * s]
        else:
            xf = x_ref[j].astype(jnp.float32)                # [S, K]
            xq, xs = _ln_quantize_rows(xf, eps)
            qkv = _q8_dot(xq, xs, wq_ref[:], wsc_ref[:]).astype(dot_dtype)

        cols = _pair_attention(qkv, heads=heads, head_dim=head_dim,
                               causal=causal, dot_dtype=dot_dtype,
                               b_eff=b_ref[:])
        if q8_out:
            attn = jnp.concatenate(cols, axis=-1)            # fp32 [S, H*D]
            aq, asc = _quantize_rows(attn)
            delta = _q8_dot(aq, asc, woq_ref[:], wosc_ref[:])
        else:
            attn = jnp.concatenate(cols, axis=-1).astype(dot_dtype)
            delta = jnp.dot(attn, wo_ref[:],
                            preferred_element_type=jnp.float32)
        o_ref[j] = (xf + delta
                    + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _mlp_q8_kernel(x_ref, w1q_ref, w1sc_ref, b1_ref, w2q_ref, w2sc_ref,
                   b2_ref, o_ref, *, eps, activation, slab):
    """Int8 twin of ln_matmul._mlp_block_kernel: o = x + act(rawLN(x)
    @int8 w1 + b1) @int8 w2 + b2.  The [S, 4K] hidden never exists in
    HBM; the GELU runs fp32 on the dequantized pre-activation.
    ``slab`` rows per dot (see _block_q8_kernel: int8's 32-sublane tile
    makes per-image S=197 dots 12% pad; the G*S slab is ~1.5%)."""
    g, s, k = x_ref.shape
    step = slab if g % slab == 0 else (2 if g % 2 == 0 else 1)
    for j0 in range(0, g, step):
        xf = x_ref[j0:j0 + step].reshape(step * s, k).astype(jnp.float32)
        xq, xs = _ln_quantize_rows(xf, eps)
        pre = _q8_dot(xq, xs, w1q_ref[:], w1sc_ref[:])
        yq, ys = _act_quantize_rows(pre + b1_ref[:].astype(jnp.float32),
                                    activation, _KERNEL_ACTIVATIONS)
        out = _q8_dot(yq, ys, w2q_ref[:], w2sc_ref[:])
        out = (xf + out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[j0:j0 + step] = out.reshape(step, s, k)


def block_q8_vmem_bytes(k, heads, head_dim, seq_len, g=1, slab=False,
                        q8_out=True):
    """Working set of the int8 attention half-block: int8 weights + fp32
    scales resident, double-buffered bf16 tiles, fp32/int8 row temps, and
    the per-pair [S, S] score temporaries.  ``slab`` holds the whole
    [G*S, ...] LN/quant/qkv chain live at once.  ``q8_out=False`` (the
    qkv-only variant) keeps the out-projection weight bf16-resident."""
    hd = heads * head_dim
    rows = g * seq_len if slab else seq_len
    w = k * 3 * hd + (hd * k if q8_out else 2 * hd * k) + 4 * (3 * hd + k)
    tile = seq_len * (2 * k + 2 * k)          # in/out bf16
    temps = rows * (4 * k + k + 4 * 3 * hd + 2 * 3 * hd)
    # per-image attention-output rows: fp32 concat + (int8 quantized copy
    # when the out-proj runs int8, else its bf16 cast for the bf16 dot)
    temps += seq_len * (4 * hd + (hd if q8_out else 2 * hd))
    scores = seq_len * seq_len * (4 + 2)
    if _packed_enabled():                     # [S, 2S] packed-keys scores
        scores *= 2
    return w + 2 * g * tile + temps + scores


def mlp_q8_vmem_bytes(k, m, seq_len, g=1, slab=1):
    rows = slab * seq_len
    w = k * m + m * k + 4 * (m + k)
    tile = seq_len * (2 * k + 2 * k)
    temps = rows * (4 * k + k + 8 * m + m)    # xf/xq + int32 dot + fp32 act
    return w + 2 * g * tile + temps


def _q8_slab_enabled():
    """Slab the projection dots across the G batch entries (default on:
    int8's 32-sublane tile pads a per-image S=197 dot 12%).  UML_Q8_SLAB=0
    for A/B."""
    import os

    return os.environ.get("UML_Q8_SLAB", "1") != "0"


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret", "q8_out"))
def _block_q8_fwd(x, wq, wsc, b_eff, wo_ops, bo, eps, heads, head_dim,
                  causal, interpret, q8_out=True):
    """``wo_ops``: (woq int8, wosc fp32) when ``q8_out`` (the serving
    default) else (wo bf16,) — the qkv-only higher-fidelity mode."""
    bsz, s, k = x.shape
    m3 = wq.shape[1]
    hd = heads * head_dim
    slab = _q8_slab_enabled()
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: block_q8_vmem_bytes(k, heads, head_dim, s, g,
                                              slab, q8_out=q8_out))
    wo_specs = [pl.BlockSpec((hd, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    if q8_out:
        wo_specs.append(pl.BlockSpec((k,), lambda i: (0,),
                                     memory_space=pltpu.VMEM))
    wo_bytes = sum(w.size * w.dtype.itemsize for w in wo_ops)
    return pl.pallas_call(
        functools.partial(_block_q8_kernel, eps=eps, heads=heads,
                          head_dim=head_dim, causal=causal,
                          dot_dtype=jnp.bfloat16, slab=slab, q8_out=q8_out),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            *wo_specs,
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * m3 + 4 * bsz * heads * s * s * head_dim
                   + 2 * bsz * s * hd * k),
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + wq.size + wo_bytes),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, wq, wsc, b_eff, *wo_ops, bo)


@functools.partial(jax.jit, static_argnames=("eps", "activation",
                                             "interpret"))
def _mlp_q8_fwd(x, w1q, w1sc, b1, w2q, w2sc, b2, eps, activation, interpret):
    bsz, s, k = x.shape
    m = w1q.shape[1]

    def _slab(g):
        # same policy as ln_matmul._mlp_slab: full-G slab at production
        # batches while the int32/fp32 hidden slab stays modest.
        # UML_Q8_MLP_SLAB overrides the images-per-chunk count for A/B:
        # smaller chunks give Mosaic independent VPU(quantize)/MXU(dot)
        # chains to overlap within one program, at the cost of row-tile
        # pad (trace-time read — A/B from a fresh process, like the
        # UML_TEXT_TOWER probes)
        import os

        env = os.environ.get("UML_Q8_MLP_SLAB")
        if env:
            return max(1, min(g, int(env)))
        if not _q8_slab_enabled():
            return 1
        if bsz >= 64 and g * s <= 1024:
            return g
        return min(g, 2) if s <= 512 else 1

    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: mlp_q8_vmem_bytes(k, m, s, g, _slab(g)))
    return pl.pallas_call(
        functools.partial(_mlp_q8_kernel, eps=eps, activation=activation,
                          slab=_slab(g)),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * s * k * m,
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + w1q.size + w2q.size),
            transcendentals=bsz * s * m if activation else 0,
        ),
        interpret=interpret,
    )(x, w1q, w1sc, b1, w2q, w2sc, b2)


# ---------------------------------------------------------------------------
# jnp references (simulated int8) — the CPU execution path and the test
# oracle.  Same quantize -> integer dot -> dequant math as the kernels;
# the integer dot runs via int32 (XLA CPU lowers int8 dots generically).


def _attn_q8_reference_core(xf, eps, wq, wsc, b_eff, heads, causal):
    from uml_tpu.ops.attention import mha_reference

    b, s, k = xf.shape
    d = wq.shape[1] // (3 * heads)
    xq, xs = _ln_quantize_rows(xf, eps)
    qkv = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkv = qkv.astype(jnp.float32) * xs * wsc[None, None, :]
    qkv = (qkv + b_eff.astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = qkv.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
    attn = mha_reference(qkv[0], qkv[1], qkv[2], causal=causal)
    return attn.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


def ln_attn_block_q8_reference(x, scale, bias, kernel, kbias, wo, bo, *,
                               heads, causal=False, eps=1e-5):
    """jnp twin of the int8 attention half-block (simulated int8)."""
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    wq, wsc = quantize_weight(w_eff)
    woq, wosc = quantize_weight(wo)
    xf = x.astype(jnp.float32)
    attn = _attn_q8_reference_core(xf, eps, wq, wsc, b_eff, heads, causal)
    aq, asc = _quantize_rows(attn.astype(jnp.float32))
    delta = jax.lax.dot_general(
        aq, woq, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    delta = delta.astype(jnp.float32) * asc * wosc[None, None, :]
    return (xf + delta + bo.astype(jnp.float32)).astype(x.dtype)


def ln_attn_block_q8qkv_reference(x, scale, bias, kernel, kbias, wo, bo, *,
                                  heads, causal=False, eps=1e-5):
    """jnp twin of the qkv-only int8 attention half-block: int8 QKV dot,
    bf16 attention + out-projection (simulated int8)."""
    w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
    wq, wsc = quantize_weight(w_eff)
    xf = x.astype(jnp.float32)
    attn = _attn_q8_reference_core(xf, eps, wq, wsc, b_eff, heads, causal)
    delta = jnp.dot(attn.astype(wo.dtype), wo,
                    preferred_element_type=jnp.float32)
    return (xf + delta + bo.astype(jnp.float32)).astype(x.dtype)


def ln_mlp_block_q8_reference(x, scale, bias, w1, b1, w2, b2, *,
                              eps=1e-5, activation=None):
    """jnp twin of the int8 MLP half-block (simulated int8)."""
    from uml_tpu.ops.ln_matmul import _ACTIVATIONS

    w1_eff, b1_eff = fold_ln_into_matmul(scale, bias, w1, b1)
    w1q, w1sc = quantize_weight(w1_eff)
    w2q, w2sc = quantize_weight(w2)
    xf = x.astype(jnp.float32)
    xq, xs = _ln_quantize_rows(xf, eps)
    pre = jax.lax.dot_general(
        xq, w1q, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    pre = pre.astype(jnp.float32) * xs * w1sc[None, None, :]
    yq, ys = _act_quantize_rows(pre + b1_eff.astype(jnp.float32),
                                activation, _ACTIVATIONS)
    out = jax.lax.dot_general(
        yq, w2q, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * ys * w2sc[None, None, :]
    return (xf + out + b2.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# public entry points (same signatures as the bf16 half-blocks)


def supports_q8_block(k: int, heads: int, head_dim: int, seq_len: int) -> bool:
    if head_dim * 2 != 128 or heads % 2 != 0 or k % 128 != 0:
        return False
    return block_q8_vmem_bytes(k, heads, head_dim, seq_len) <= VMEM_CEILING


def supports_q8_mlp(k: int, m: int, seq_len: int) -> bool:
    return (k % 128 == 0 and m % 128 == 0
            and mlp_q8_vmem_bytes(k, m, seq_len) <= VMEM_CEILING)


def ln_attn_block_q8(x, scale, bias, kernel, kbias, wo, bo, *, heads: int,
                     causal: bool = False, eps: float = 1e-5,
                     impl: str = "auto", q8_out: bool = True):
    """x + (MHA(LN(x)) @ wo + bo) with int8 projection matmuls.

    Inference-only (no custom_vjp — training uses the bf16 half-blocks).
    ``impl='auto'``: Pallas on TPU for supported shapes, else the jnp
    simulated-int8 reference (identical quantization math, so CPU runs
    and unit tests exercise the same numerics the TPU kernel computes).
    ``q8_out=False``: qkv-only variant — the out-projection stays bf16,
    skipping the attention-output quantize (_block_q8_kernel with
    q8_out=False).
    """
    d = kernel.shape[1] // (3 * heads)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3
                and wo.shape == (heads * d, x.shape[-1])
                and supports_q8_block(x.shape[-1], heads, d, x.shape[1])
                else "reference")
    if impl == "pallas":
        w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
        wq, wsc = quantize_weight(w_eff)
        interpret = jax.default_backend() == "cpu"
        wo_ops = (quantize_weight(wo) if q8_out
                  else (wo.astype(jnp.bfloat16),))
        return _block_q8_fwd(x, wq, wsc, b_eff, wo_ops, bo, eps, heads,
                             d, causal, interpret, q8_out=q8_out)
    if not q8_out:
        return ln_attn_block_q8qkv_reference(
            x, scale, bias, kernel, kbias, wo.astype(jnp.bfloat16), bo,
            heads=heads, causal=causal, eps=eps)
    return ln_attn_block_q8_reference(x, scale, bias, kernel, kbias, wo, bo,
                                      heads=heads, causal=causal, eps=eps)


def ln_mlp_block_q8(x, scale, bias, w1, b1, w2, b2, *, eps: float = 1e-5,
                    activation: str | None = None, impl: str = "auto"):
    """x + act(LN(x) @ w1 + b1) @ w2 + b2 with int8 matmuls (see
    ln_attn_block_q8; inference-only)."""
    k = x.shape[-1]
    m = w1.shape[-1]
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3 and w2.shape == (m, k)
                and supports_q8_mlp(k, m, x.shape[1])
                else "reference")
    if impl == "pallas":
        w1_eff, b1_eff = fold_ln_into_matmul(scale, bias, w1, b1)
        w1q, w1sc = quantize_weight(w1_eff)
        w2q, w2sc = quantize_weight(w2)
        interpret = jax.default_backend() == "cpu"
        return _mlp_q8_fwd(x, w1q, w1sc, b1_eff, w2q, w2sc, b2, eps,
                           activation, interpret)
    return ln_mlp_block_q8_reference(x, scale, bias, w1, b1, w2, b2,
                                     eps=eps, activation=activation)
