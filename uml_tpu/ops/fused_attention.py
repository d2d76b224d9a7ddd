"""Fused LN -> QKV -> multi-head attention Pallas kernel.

The profiled cost of a ViT-B/16 residual-attention block on v5e (bs512,
after the ln_matmul/bf16-score work) is dominated by HBM structure, not
FLOPs: the packed QKV tensor round-trips HBM (write + transpose copies +
re-read, ~3.3 ms/layer) and the [S, S] score tensor streams out and back
for the two-pass softmax (~3.1 ms/layer).  This kernel runs the whole
pre-attention chain for one batch entry in VMEM: LayerNorm on the resident
row tile, the QKV projection on the MXU, and per-head attention — qkv and
the scores never exist in HBM.

Head-pair trick: Mosaic rejects 64-lane blocks/slices, but with D=64 two
adjacent heads occupy exactly one 128-lane tile of the packed [S, 3*H*64]
QKV — so every slice this kernel takes is 128-aligned.  Per pair, each
head's scores come from a dot with the OTHER head's lanes zeroed in q
(zeros contribute nothing to the contraction — exact), and the two value
products are masked per head and summed, composing both heads' outputs in
their own lanes.  No padded weights (a first version padded D 64->128 and
doubled the QKV matmul FLOPs — measured +1.9 ms/layer), and the output is
the reference [B, S, H*D] layout straight into the standard out-proj.

Backward: the half-block has a hand-written flash-style Pallas backward
(_block_bwd_kernel, both non-causal and causal) — XLA's autodiff of the
twin materialized per-head [S, S] probabilities in HBM and ran the softmax
backward as unfused passes.  The standalone-attention path (ln_qkv_attention
without the out-proj) keeps the custom_vjp jnp-twin recompute (cold path).

Reference analog: torch nn.MultiheadAttention inside the vendored CLIP
(engine/clip/model.py:171) — fp16 end to end, so fp32 LN/softmax
statistics here are strictly more precise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIR_W = 128  # two D=64 heads per 128-lane tile


VMEM_CEILING = 96 * 2**20  # leave headroom of v5e's 128 MB/core for XLA


def _packed_enabled():
    """Packed-keys score layout (see _pair_attention_split).  Default OFF
    by measurement: the on-device A/B (tools/exp_attn_packed.py, composed
    bs2048 extraction forwards, same relay window, drift control <0.3%)
    measured packed/unpacked = 1.0036 (DINOv2 B/14), 1.0034 (L/14),
    0.9859 (ViT-B/16) — the predicted -17% score-lane saving on S=257
    towers is real but scores are too small a slice of those forwards to
    matter, and on S=197 the layout is lane-neutral yet times 1.4% slower
    (likely the [S,2S] temporary's worse VMEM locality).  Kept as an
    opt-in (UML_ATTN_PACKED=1, non-causal) for future shapes where the
    score/projection ratio is higher."""
    return os.environ.get("UML_ATTN_PACKED", "0") == "1"


def fused_block_vmem_bytes(k, heads, head_dim, seq_len, itemsize=2,
                           with_proj=False, g=1):
    """Estimated VMEM need of the attention half-block kernel: resident
    weights + double-buffered in/out tiles for G entries + the per-pair
    score temporaries ([S, S] fp32 + bf16; the packed-keys layout holds
    [S, 2S] instead)."""
    w = k * 3 * heads * head_dim * itemsize
    if with_proj:
        w += heads * head_dim * k * itemsize
    tile = seq_len * (k * itemsize
                      + 3 * heads * head_dim * (4 + itemsize)
                      + heads * head_dim * itemsize)
    scores = seq_len * seq_len * (4 + itemsize)
    if _packed_enabled():
        scores *= 2
    return w + 2 * g * tile + scores


def _fits_default_vmem(k, heads, head_dim, seq_len, itemsize=2,
                       with_proj=False, extra=0):
    """Shapes that compile and run well under Mosaic's default 16 MB
    scoped limit (the round-2 empirical gate).  These get NO explicit
    vmem_limit_bytes, preserving measured behavior; larger shapes
    (DINO-L/14, DINO-B/8) get an explicit raise instead.  ``extra``:
    additional per-program bytes a caller's kernel holds beyond the
    forward footprint this function models (e.g. a backward's
    double-buffered output tiles)."""
    w_bytes = k * 3 * heads * head_dim * itemsize
    if with_proj:
        w_bytes += heads * head_dim * k * itemsize
    tile_bytes = seq_len * (k * itemsize
                            + 3 * heads * head_dim * (4 + itemsize)
                            + heads * head_dim * itemsize)
    return w_bytes + tile_bytes + extra <= 13 * 1024 * 1024


def _default_fwd_g(seq_len):
    """Measured per-shape default for the forward kernels' per-program
    batch group G (same-window UML_KERNEL_G sweeps on the v5e chip,
    round 4): the S=197 ViT-B/16 headline keeps G=4 (round-2 setting);
    the S=257 towers run +8-11% at G=2 (DINOv2 B/14 3607.6 vs 3325.6,
    L/14 1063.8 vs ~957 img/s — the [S,S] fp32 score temps double-buffer
    poorly at G=4); the S=785 DINO-B/8 runs best at G=1 (1079.9 vs 971.3
    at G=2).  UML_KERNEL_G still overrides for A/Bs."""
    if seq_len >= 512:
        return 1
    if seq_len >= 224:
        return 2
    return 4


def _group_and_params(bsz, default_g=4, env="UML_KERNEL_G", need_fn=None):
    """(per-program batch group G, CompilerParams) for the block kernels.

    G images per program give the VLIW scheduler independent chains (one
    image's VPU softmax/LN overlaps another's MXU dots).  Mosaic's
    scoped-VMEM default is 16 MB; shapes that need more (G > 4 groups,
    DINO-L/14's k=1024 S=257, DINO-B/8's S=785) get an explicit
    vmem_limit_bytes raise — v5e has 128 MB VMEM/core.  ``need_fn(g)``
    estimates the kernel's working set; shapes fitting the default limit
    get NO explicit param (preserving the measured-good ViT-B behavior).
    UML_KERNEL_G / UML_BWD_G / UML_VMEM_MB override for perf A/Bs.
    """
    g = int(os.environ.get(env, default_g))
    while g > 1 and bsz % g != 0:
        g //= 2
    vmem_mb = int(os.environ.get("UML_VMEM_MB", 0))
    if not vmem_mb:
        need = need_fn(g) if need_fn is not None else None
        if need is not None and need > 12 * 2**20:
            # 1.3x estimate slack, MB-rounded, capped at the ceiling
            vmem_mb = min(int(need * 1.3 / 2**20) + 1,
                          VMEM_CEILING // 2**20)
        elif g > 4:
            vmem_mb = 64
    params = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
              if vmem_mb else None)
    return g, params


def _kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *,
            eps, heads, head_dim, causal):
    xf = x_ref[:].astype(jnp.float32)                    # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    qkv = jnp.dot(xn.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    cols = _pair_attention(qkv, heads=heads, head_dim=head_dim,
                           causal=causal, dot_dtype=o_ref.dtype)
    for p, out in enumerate(cols):
        o_ref[:, p * PAIR_W:(p + 1) * PAIR_W] = out.astype(o_ref.dtype)


NOMAX_CLAMP = 96.0  # exp2 argument cap; raw attention logit 96/log2(e) = 66.5


def _pair_attention(qkv, *, heads, head_dim, causal, dot_dtype, b_eff=None):
    """Packed-qkv entry point: q/k/v live at column offsets 0/H*D/2*H*D."""
    hp = heads * head_dim
    return _pair_attention_split(
        qkv, 0, qkv, hp, qkv, 2 * hp, heads=heads, head_dim=head_dim,
        causal=causal, dot_dtype=dot_dtype, b_eff=b_eff)


def _pair_attention_split(q_arr, q_off, k_arr, k_off, v_arr, v_off, *,
                          heads, head_dim, causal, dot_dtype, b_eff=None):
    """Per-head-pair attention on VMEM-resident q/k/v column blocks.

    ``q_arr``/``k_arr``/``v_arr`` hold the per-head columns starting at
    the given column offsets (the packed [S, 3*H*D] qkv passes itself
    three times; the CLS-only kernel passes a short q and a [S, 2*H*D]
    kv).  Returns the [Sq, H*D] attention output as a list of
    [Sq, PAIR_W] fp32 columns (one per pair).

    Softmax is two passes over the [Sq, S] scores instead of the naive
    seven: the 1/sqrt(D) scale is folded into the per-head q mask (0.125
    is exact in bf16), the exp is written straight in the dot dtype, and
    normalization happens AFTER the attention-value dot on the [Sq, D]
    unnormalized output (flash identity: (e/l) @ v == (e @ v) * (1/l)).
    The non-causal path skips the row-max subtraction entirely
    (exp2(sc) / sum(exp2(sc)) is the same softmax): CLIP/DINO attention
    logits are O(10), and NOMAX_CLAMP caps the exp2 argument so fp32
    can't overflow before logits reach 66 — far beyond anything a sane
    checkpoint produces (measured gain: 0.2 ms/layer at ViT-B/16 bs512).
    The causal (text) path keeps the exact row max: masked rows put -1e30
    in the lanes and a fresh head could make every unmasked score large.

    When ``b_eff`` (the packed [3*H*D] QKV bias) is given, the bias never
    touches the [S, 3*H*D] tensor: the k-bias is dropped outright (a
    per-row-constant score shift, exactly invariant under softmax), the
    q-bias rides the per-mask scale multiply as an FMA, and the v-bias is
    added once to the normalized output (softmax weights sum to 1, so
    w @ (v + bv) == w @ v + bv).

    Packed-keys layout (UML_ATTN_PACKED, non-causal only): instead of two
    [Sq,128]x[128,S] dots per pair (one per head, the other head's lanes
    zeroed in q), build K_packed = [k2*m0; k2*m1] (shape [2S, 128]) and
    compute ONE [Sq,128]x[128,2S] dot — head a's scores land in key
    columns 0..S-1, head b's in S..2S-1, and the zeroed cross-head d-rows
    of K_packed kill the cross terms exactly (so q needs NO half mask).
    The win is lane padding on the score/softmax tensor: Mosaic pads the
    lane dim to 128, so per pair the old layout pays 2*pad128(S) lanes
    while packed pays pad128(2S) — for S=257 towers (DINOv2 B/14 & L/14,
    CLIP L/14) that is 768 -> 640 lanes (-17% score MXU + exp2 VPU); for
    S=197 both pad to 512 (neutral, but half the dot count); for S=785,
    1792 -> 1664.  A@V packs the values the same way ([2S,128] with
    complementary halves zeroed), contraction over 2S, and the per-head
    1/l normalization rides one masked FMA.  Numerics: identical score
    values, identical exp2, per-head row sums over the same S terms, and
    the AV contraction only adds exact zeros — same math as the unpacked
    path modulo fp32 accumulation order.
    """
    sq = q_arr.shape[0]
    s = k_arr.shape[0]
    # log2(e) folded into the q scale: exp(x) == exp2(x*log2e), and the
    # multiply rides the existing mask-scale pass for free (softmax
    # weights are base-invariant once scores are pre-scaled)
    log2e = 1.4426950408889634
    scale = head_dim ** -0.5 * log2e
    hp = heads * head_dim
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, s), 1)
        causal_mask = cols <= rows + (s - sq)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_W), 1)
    half_masks = ((lane < head_dim).astype(jnp.float32),
                  (lane >= head_dim).astype(jnp.float32))
    packed = _packed_enabled() and not causal
    if packed:
        key_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * s), 1)
        key_half = (key_lane < s, key_lane >= s)
    out_cols = []
    for p in range(heads // 2):
        q2 = q_arr[:, q_off + p * PAIR_W: q_off + (p + 1) * PAIR_W]
        k2 = k_arr[:, k_off + p * PAIR_W: k_off + (p + 1) * PAIR_W]
        v2 = v_arr[:, v_off + p * PAIR_W: v_off + (p + 1) * PAIR_W]
        if b_eff is not None:
            bq2 = b_eff[p * PAIR_W:(p + 1) * PAIR_W].astype(jnp.float32)
            bv2 = b_eff[2 * hp + p * PAIR_W:
                        2 * hp + (p + 1) * PAIR_W].astype(jnp.float32)
        if packed:
            # scale (and q-bias) applied to the full pair row — the zeroed
            # cross-head d-rows of K_packed make a q half-mask unnecessary
            sc_b = jnp.asarray(scale, jnp.float32).astype(dot_dtype)
            if b_eff is None:
                qm = q2 * sc_b
            else:
                qm = q2 * sc_b + (bq2[None, :] * scale).astype(dot_dtype)
            kp = jnp.concatenate(
                [k2 * half_masks[0].astype(dot_dtype),
                 k2 * half_masks[1].astype(dot_dtype)], axis=0)  # [2S, 128]
            sc = jax.lax.dot_general(
                qm, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)              # [Sq, 2S]
            e = jnp.exp2(jnp.minimum(sc, NOMAX_CLAMP)).astype(dot_dtype)
            zero = jnp.zeros((), dot_dtype)
            l_a = jnp.maximum(jnp.sum(
                jnp.where(key_half[0], e, zero), axis=-1, keepdims=True,
                dtype=jnp.float32), 1e-30)
            l_b = jnp.maximum(jnp.sum(
                jnp.where(key_half[1], e, zero), axis=-1, keepdims=True,
                dtype=jnp.float32), 1e-30)
            vp = jnp.concatenate(
                [v2 * half_masks[0].astype(dot_dtype),
                 v2 * half_masks[1].astype(dot_dtype)], axis=0)  # [2S, 128]
            av = jnp.dot(e, vp, preferred_element_type=jnp.float32)
            inv = half_masks[0] * (1.0 / l_a) + half_masks[1] * (1.0 / l_b)
            acc = av * inv                                       # [Sq, 128]
            if b_eff is not None:
                acc = acc + bv2[None, :]
            out_cols.append(acc)
            continue
        acc = jnp.zeros((sq, PAIR_W), jnp.float32)
        for m in half_masks:
            ms = (m * scale).astype(dot_dtype)
            if b_eff is None:
                qm = q2 * ms
            else:
                qm = q2 * ms + (bq2[None, :] * scale * m).astype(dot_dtype)
            sc = jax.lax.dot_general(
                qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Sq, S]
            if causal:
                sc = jnp.where(causal_mask, sc, -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2(sc - mx).astype(dot_dtype)
            else:
                e = jnp.exp2(jnp.minimum(sc, NOMAX_CLAMP)).astype(dot_dtype)
            l = jnp.sum(e, axis=-1, keepdims=True,
                        dtype=jnp.float32)                   # [Sq, 1]
            if not causal:
                # without the row-max subtraction a row whose every score
                # is < -133 underflows e to all-zeros in bf16; clamp l so
                # a diverging training run saturates to 0 instead of NaN
                # (0 * inf).  The causal path's max-sub guarantees l >= 1.
                l = jnp.maximum(l, 1e-30)
            o = jnp.dot(e, v2 * m.astype(dot_dtype),
                        preferred_element_type=jnp.float32)  # [Sq, PAIR_W]
            acc = acc + o * (1.0 / l)
        if b_eff is not None:
            acc = acc + bv2[None, :]
        out_cols.append(acc)
    return out_cols


def _block_kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref,
                  o_ref, *, eps, heads, head_dim, causal, slab=False):
    """Whole attention half-block for a few batch entries, VMEM-resident:
    o = x + (MHA(rawLN(x) @ w + b) @ wo + bo).  qkv, the [S, S] scores,
    the attention output, and the out-projection delta never exist in HBM.

    The LN scale/bias are already folded into ``w``/``b`` by the caller
    ((xn*s + t) @ W == xn @ (s*W) + t@W), so the normalize is two VPU
    passes (Mosaic requires a 32-bit matmul accumulator, so the
    bias-add + cast epilogue stays).  x_ref is [G, S, K]: processing G
    independent images per program gives the VLIW scheduler parallel
    chains, overlapping one image's VPU softmax with another's MXU dots.

    ``slab`` (UML_ATTN_SLAB=1, default off — measured a LOSS on-device):
    run the QKV projection as one [G*S, K] dot — amortizes the bf16
    8-sublane pad (197 -> 200 rows, 1.5%) the way the MLP kernel's
    full-G slab measured +0.5%; attention/out-proj stay per-image.
    Same-window A/B on the v5e chip (tools/exp_attn_slab.py, bs2048):
    slab/base 0.9919 with drift control 0.9958 — the reshape between
    the slab dot and the per-image attention loop costs more than the
    pad it saves (unlike the MLP kernel, whose whole body is slabbed),
    so the per-image layout stays the default."""
    g, s, k = x_ref.shape
    if slab:
        xf_all = x_ref[:].reshape(g * s, k).astype(jnp.float32)
        mean = jnp.mean(xf_all, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf_all * xf_all, axis=-1, keepdims=True) - mean * mean,
            0.0)
        xn_all = ((xf_all - mean) * jax.lax.rsqrt(var + eps)).astype(
            w_ref.dtype)
        qkv_all = jnp.dot(xn_all, w_ref[:],
                          preferred_element_type=jnp.float32).astype(
            w_ref.dtype)
    for j in range(g):
        if slab:
            xf = xf_all[j * s:(j + 1) * s]
            qkv = qkv_all[j * s:(j + 1) * s]
        else:
            xf = x_ref[j].astype(jnp.float32)                # [S, K]
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
            xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
            qkv = jnp.dot(xn, w_ref[:],
                          preferred_element_type=jnp.float32).astype(
                w_ref.dtype)

        # the packed QKV bias is applied inside _pair_attention without a
        # [S, 3*H*D] pass (k-bias exactly dropped, q-bias FMA'd into the
        # mask multiply, v-bias post-added)
        cols = _pair_attention(qkv, heads=heads, head_dim=head_dim,
                               causal=causal, dot_dtype=w_ref.dtype,
                               b_eff=b_ref[:])
        attn = jnp.concatenate(cols, axis=-1).astype(wo_ref.dtype)
        delta = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
        o_ref[j] = (xf + delta
                    + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _stash_enabled():
    """Train-time stash of the attention half-block's qkv projection and
    attention output (UML_BWD_STASH, default ON for the non-causal
    vision path): the backward otherwise RECOMPUTES qkv (2*S*K*3K MACs —
    ~30% of the whole backward's MXU work at ViT-B) and the attention
    output (the per-pair e@v dots, another ~5%) from x.  Saving both
    from the forward trades ~1.2 MB/img/layer of HBM traffic (~9 ms at
    bs512 on the v5e's 819 GB/s) for that recompute, and the saved
    tensors are BIT-IDENTICAL to the recompute (same dots, same casts),
    so the backward's math is unchanged (device A/B agrees to ~1 bf16
    ulp — two Mosaic programs may schedule fp32 sums differently).
    Measured on the v5e (tools/exp_bwd_stash.py, same-window A/B, drift
    control <1%): composed 12-layer fwd+bwd 454.7 -> 418.6 ms at bs512
    (0.921x), 126.0 -> 113.5 ms at bs128 (0.901x); the stash writes are
    free in the forward (117.7 -> 116.6 ms).  Memory cost: S*(3K+K)*2 B
    per img per layer (1.9 GB at bs128, 7.4 GB at bs512 for ViT-B/16)
    on top of the 2 saved residuals — the reference finetunes at
    bs64-128 (finetune.py HYPER_DICT), where this is cheap."""
    return os.environ.get("UML_BWD_STASH", "1") == "1"


def _block_kernel_stash(x_ref, w_ref, b_ref, wo_ref, bo_ref,
                        o_ref, qkv_ref, attn_ref, *,
                        eps, heads, head_dim, causal):
    """_block_kernel twin that also writes the qkv projection and the
    attention output (pre out-proj, v-bias included) to HBM for the
    stash backward.  Used only under differentiation (custom_vjp fwd)."""
    g = x_ref.shape[0]
    for j in range(g):
        xf = x_ref[j].astype(jnp.float32)                # [S, K]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
        qkv = jnp.dot(xn, w_ref[:],
                      preferred_element_type=jnp.float32).astype(
            w_ref.dtype)
        qkv_ref[j] = qkv.astype(qkv_ref.dtype)

        cols = _pair_attention(qkv, heads=heads, head_dim=head_dim,
                               causal=causal, dot_dtype=w_ref.dtype,
                               b_eff=b_ref[:])
        attn = jnp.concatenate(cols, axis=-1).astype(wo_ref.dtype)
        attn_ref[j] = attn.astype(attn_ref.dtype)
        delta = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
        o_ref[j] = (xf + delta
                    + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret"))
def _block_fwd_stash(x, w_eff, b_eff, wo, bo, eps, heads, head_dim,
                     causal, interpret):
    bsz, s, k = x.shape
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g)
        + 2 * g * s * (m3 + hd) * x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_block_kernel_stash, eps=eps, heads=heads,
                          head_dim=head_dim, causal=causal),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, m3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # out
            jax.ShapeDtypeStruct((bsz, s, m3), x.dtype),   # qkv stash
            jax.ShapeDtypeStruct((bsz, s, hd), x.dtype),   # attn stash
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * m3 + 4 * bsz * heads * s * s * head_dim
                   + 2 * bsz * s * hd * k),
            bytes_accessed=((2 * s * k + s * m3 + s * hd) * bsz
                            * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, w_eff, b_eff, wo, bo)


CLS_ROWS = 8  # minimum sublane tile; row 0 (the CLS token) is what's used


def _block_cls_kernel(x_ref, w_ref, b_ref, wo_ref, bo_ref, o_ref, *,
                      eps, heads, head_dim):
    """Attention half-block computing only the first CLS_ROWS query rows.

    For CLIP/DINO feature extraction the network's output is the CLS
    token alone, so the last block's queries beyond row 0 are dead work:
    k/v still need every row (the CLS token attends over all patches),
    but the scores drop from [S, S] to [8, S], and the out-projection,
    residual, and downstream MLP shrink 197 -> 8 rows (~6% of the whole
    ViT-B/16 forward).  The QKV matmul splits into a [K, 2*H*D] kv dot
    over all rows and a [K, H*D] q dot over the first 8, saving the
    other 189 q rows too.  Output rows beyond 0 are real attention
    outputs for patch tokens 1..7 (unused, sublane padding)."""
    hp = heads * head_dim
    w_q = w_ref[:, :hp]
    w_kv = w_ref[:, hp:]
    for j in range(x_ref.shape[0]):
        xf = x_ref[j].astype(jnp.float32)                    # [S, K]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_ref.dtype)
        kv = jnp.dot(xn, w_kv,
                     preferred_element_type=jnp.float32).astype(w_ref.dtype)
        q8 = jnp.dot(xn[:CLS_ROWS], w_q,
                     preferred_element_type=jnp.float32).astype(w_ref.dtype)
        cols = _pair_attention_split(
            q8, 0, kv, 0, kv, hp, heads=heads, head_dim=head_dim,
            causal=False, dot_dtype=w_ref.dtype, b_eff=b_ref[:])
        attn = jnp.concatenate(cols, axis=-1).astype(wo_ref.dtype)
        delta = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
        o_ref[j] = (xf[:CLS_ROWS] + delta
                    + bo_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _raw_block_reference(x, w_eff, b_eff, wo, bo, *, heads, causal, eps):
    """jnp twin of _block_kernel (post-fold form), for the custom_vjp."""
    from uml_tpu.ops.attention import mha_reference

    b, s, _ = x.shape
    d = w_eff.shape[1] // (3 * heads)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(w_eff.dtype)
    qkv = jnp.dot(xn, w_eff, preferred_element_type=jnp.float32)
    qkv = (qkv + b_eff.astype(jnp.float32)).astype(w_eff.dtype)
    qkv = qkv.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
    attn = mha_reference(qkv[0], qkv[1], qkv[2], causal=causal)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
    delta = jnp.dot(attn.astype(wo.dtype), wo,
                    preferred_element_type=jnp.float32)
    return (xf + delta + bo.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret"))
def _block_fwd(x, w_eff, b_eff, wo, bo, eps, heads, head_dim,
               causal, interpret):
    bsz, s, k = x.shape
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: None if _fits_default_vmem(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True)
        else fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g))
    return pl.pallas_call(
        functools.partial(_block_kernel, eps=eps, heads=heads,
                          head_dim=head_dim, causal=causal,
                          slab=os.environ.get("UML_ATTN_SLAB") == "1"),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * m3 + 4 * bsz * heads * s * s * head_dim
                   + 2 * bsz * s * hd * k),
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, w_eff, b_eff, wo, bo)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "interpret"))
def _block_cls_fwd(x, w_eff, b_eff, wo, bo, eps, heads, head_dim,
                   interpret):
    bsz, s, k = x.shape
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    g, cparams = _group_and_params(
        bsz, default_g=_default_fwd_g(s),
        need_fn=lambda g: None if _fits_default_vmem(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True)
        else fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g))
    return pl.pallas_call(
        functools.partial(_block_cls_kernel, eps=eps, heads=heads,
                          head_dim=head_dim),
        grid=(bsz // g,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, CLS_ROWS, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, CLS_ROWS, k), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * (m3 - hd) + 2 * bsz * CLS_ROWS * k * hd
                   + 4 * bsz * heads * CLS_ROWS * s * head_dim
                   + 2 * bsz * CLS_ROWS * hd * k),
            bytes_accessed=(x.size * x.dtype.itemsize
                            + bsz * CLS_ROWS * k * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * CLS_ROWS * s,
        ),
        interpret=interpret,
    )(x, w_eff, b_eff, wo, bo)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret"))
def _fwd(x, scale, bias, kernel, kbias, eps, heads, head_dim, causal,
         interpret):
    bsz, s, k = x.shape
    m3 = kernel.shape[1]
    _, cparams = _group_and_params(
        bsz, default_g=1, need_fn=lambda g: None if _fits_default_vmem(
            k, heads, head_dim, s, kernel.dtype.itemsize, False)
        else fused_block_vmem_bytes(
            k, heads, head_dim, s, kernel.dtype.itemsize, False, g))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, heads=heads, head_dim=head_dim,
                          causal=causal),
        grid=(bsz,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((None, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, s, heads * head_dim),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, heads * head_dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * k * m3 + 4 * bsz * heads * s * s * head_dim,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + kernel.size * kernel.dtype.itemsize
                            + bsz * s * heads * head_dim * x.dtype.itemsize),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, scale, bias, kernel, kbias)
    return out


def ln_qkv_attention_reference(x, scale, bias, kernel, kbias, *, heads,
                               causal=False, eps=1e-5):
    """jnp reference: LN -> packed QKV -> MHA; output [B, S, H*D]."""
    from uml_tpu.ops.attention import mha_reference
    from uml_tpu.ops.ln_matmul import ln_matmul_reference

    b, s, _ = x.shape
    d = kernel.shape[1] // (3 * heads)
    qkv = ln_matmul_reference(x, scale, bias, kernel, kbias, eps=eps)
    qkv = qkv.reshape(b, s, 3, heads, d).transpose(2, 0, 3, 1, 4)
    attn = mha_reference(qkv[0], qkv[1], qkv[2], causal=causal)
    return attn.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


def supports_fused_attention(k: int, heads: int, head_dim: int,
                             seq_len: int, itemsize: int = 2,
                             with_proj: bool = False) -> bool:
    """Head-pair mode needs D=64 and an even head count; the single-entry
    working set (weights resident + double-buffered tiles + score temps)
    must fit under VMEM_CEILING — shapes that exceed Mosaic's 16 MB
    scoped default (DINO-L/14, DINO-B/8) get an explicit
    vmem_limit_bytes raise from _group_and_params instead of falling off
    the fused path.  ``with_proj`` accounts for the extra resident
    [H*D, K] out-projection weight of the whole-half-block kernel."""
    if head_dim * 2 != PAIR_W or heads % 2 != 0 or k % 128 != 0:
        return False
    return fused_block_vmem_bytes(k, heads, head_dim, seq_len, itemsize,
                                  with_proj, g=1) <= VMEM_CEILING


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused(x, scale, bias, kernel, kbias, heads, head_dim, causal, eps):
    interpret = jax.default_backend() == "cpu"
    return _fwd(x, scale, bias, kernel, kbias, eps, heads, head_dim, causal,
                interpret)


def _fused_fwd(x, scale, bias, kernel, kbias, heads, head_dim, causal, eps):
    return (_fused(x, scale, bias, kernel, kbias, heads, head_dim, causal,
                   eps),
            (x, scale, bias, kernel, kbias))


def _fused_bwd(heads, head_dim, causal, eps, res, g):
    x, scale, bias, kernel, kbias = res
    _, vjp = jax.vjp(
        lambda x, scale, bias, kernel, kbias: ln_qkv_attention_reference(
            x, scale, bias, kernel, kbias, heads=heads, causal=causal,
            eps=eps),
        x, scale, bias, kernel, kbias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo, *,
                            heads, causal=False, eps=1e-5):
    """jnp reference: x + (MHA(LN(x)) @ wo + bo) — the pre-LN block's
    attention half including the residual add (engine/clip/model.py:181)."""
    attn = ln_qkv_attention_reference(x, scale, bias, kernel, kbias,
                                      heads=heads, causal=causal, eps=eps)
    delta = jnp.dot(attn.astype(wo.dtype), wo,
                    preferred_element_type=jnp.float32)
    out = x.astype(jnp.float32) + delta + bo.astype(jnp.float32)
    return out.astype(x.dtype)


def _block_bwd_kernel(x_ref, g_ref, w_ref, b_ref, wo_ref,
                      dx_ref, dqkv_ref, xn_ref, attn_ref, *,
                      eps, heads, head_dim, causal, il):
    """Hand-written backward of the attention half-block.

    One batch entry per program.  Recomputes LN -> qkv -> per-head-pair
    softmax in VMEM (the same exp2/no-max math as the forward, so the
    recomputed probabilities match the forward's bit for bit), then runs
    the flash-style backward per head:
        dO  = (g @ woT) masked per head
        dv  = eT @ (dO * 1/l)                  (P = e/l, folded)
        dP  = dO @ vT
        dsc = ln2/l * e * (dP - rowsum(P*dP))
        dq  = (dsc @ k) * mask*scale,  dk = dscT @ qm
        dxn += per-pair dq/dk/dv @ W-sliceT    (accumulated on the fly)
        dx  = LN-backward(dxn) + g             (residual)
    The [S, S] probability tensor never exists in HBM — XLA's autodiff of
    the jnp twin materializes it per head and runs the softmax backward
    as unfused elementwise+reduce passes (measured 8.2 ms/layer fwd+bwd
    at ViT-B/16 bs128 vs ~3.5 ideal).  ``dqkv``/``xn``/``attn`` go out to
    HBM so the three weight/bias grads are large 2-dim-contraction XLA
    dots at full MXU rate.

    The k-bias receives its gradient through the column sums of dqkv's
    k-section, which are exactly zero (softmax shift invariance), and the
    v-bias through the v-section's column sums (softmax rows sum to 1) —
    both emerge from db_eff = sum(dqkv) with no special handling.

    Bias handling in the recompute mirrors the forward exactly (k-bias
    dropped, q-bias FMA'd into the mask-scale multiply, v-bias post-added
    to the pair output): the recomputed scores are then bit-identical to
    the forward's, so the NOMAX_CLAMP stop-gradient indicator below is
    evaluated against the same clamp region the forward saw.  The v-bias
    is also exactly absent from dsc (dP gains a per-row constant from it,
    and P(dP - rowsum(P*dP)) kills row constants), so dP uses the raw v.
    """
    hp = heads * head_dim
    log2e = 1.4426950408889634
    ln2 = 0.6931471805599453
    scale = head_dim ** -0.5 * log2e
    dot_dtype = w_ref.dtype

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_W), 1)
    half_masks = ((lane < head_dim).astype(jnp.float32),
                  (lane >= head_dim).astype(jnp.float32))
    # G batch entries per program (like the forward): independent chains
    # let the VLIW scheduler overlap one image's VPU softmax-backward with
    # another's MXU dots
    s = x_ref.shape[1]
    causal_mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        causal_mask = cols <= rows
    one = (functools.partial(_block_bwd_one_il, il=il) if il > 1
           else _block_bwd_one)
    for j in range(x_ref.shape[0]):
        one(x_ref, g_ref, w_ref, b_ref, wo_ref, dx_ref, dqkv_ref,
            xn_ref, attn_ref, j, eps=eps, heads=heads,
            head_dim=head_dim, hp=hp, ln2=ln2, scale=scale,
            dot_dtype=dot_dtype, half_masks=half_masks,
            causal_mask=causal_mask)


def _block_bwd_one(x_ref, g_ref, w_ref, b_ref, wo_ref, dx_ref, dqkv_ref,
                   xn_ref, attn_ref, j, *, eps, heads, head_dim, hp, ln2,
                   scale, dot_dtype, half_masks, causal_mask=None):
    xf = x_ref[j].astype(jnp.float32)                        # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xnb = xn32.astype(dot_dtype)
    xn_ref[j] = xnb.astype(xn_ref.dtype)

    qkv = jnp.dot(xnb, w_ref[:],
                  preferred_element_type=jnp.float32).astype(dot_dtype)

    gof = g_ref[j]
    dattn = jax.lax.dot_general(
        gof, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, H*D]

    s = xf.shape[0]
    dqkv_cols = []
    for p in range(heads // 2):
        q2 = qkv[:, p * PAIR_W:(p + 1) * PAIR_W]
        k2 = qkv[:, hp + p * PAIR_W: hp + (p + 1) * PAIR_W]
        v2 = qkv[:, 2 * hp + p * PAIR_W: 2 * hp + (p + 1) * PAIR_W]
        bq2 = b_ref[p * PAIR_W:(p + 1) * PAIR_W].astype(jnp.float32)
        bv2 = b_ref[2 * hp + p * PAIR_W:
                    2 * hp + (p + 1) * PAIR_W].astype(jnp.float32)
        d_pair = dattn[:, p * PAIR_W:(p + 1) * PAIR_W]
        dq2 = jnp.zeros((s, PAIR_W), jnp.float32)
        dk2 = jnp.zeros((s, PAIR_W), jnp.float32)
        dv2 = jnp.zeros((s, PAIR_W), jnp.float32)
        attn_pair = jnp.zeros((s, PAIR_W), jnp.float32)
        for m in half_masks:
            ms = (m * scale).astype(dot_dtype)
            qm = q2 * ms + (bq2[None, :] * scale * m).astype(dot_dtype)
            sc = jax.lax.dot_general(
                qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            if causal_mask is not None:
                # forward causal math (_pair_attention): mask, exact row
                # max; masked entries get e = 0, so their dsc vanishes
                # through the e factor with no explicit dsc mask
                sc = jnp.where(causal_mask, sc, -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2(sc - mx)                        # fp32
                linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            else:
                e = jnp.exp2(jnp.minimum(sc, NOMAX_CLAMP))   # fp32
                # same underflow guard as the forward: an all-negative
                # score row sums to 0 without the row-max subtraction
                linv = 1.0 / jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True), 1e-30)  # [S, 1]
            eb = e.astype(dot_dtype)
            vm = v2 * m.astype(dot_dtype)
            o = jnp.dot(eb, vm, preferred_element_type=jnp.float32)
            attn_pair = attn_pair + o * linv
            dO = d_pair * m                                  # [S, PAIR_W] f32
            dOl = (dO * linv).astype(dot_dtype)
            dv2 = dv2 + jax.lax.dot_general(
                eb, dOl, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * m
            dP = jax.lax.dot_general(
                dO.astype(dot_dtype), vm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            rd = jnp.sum(e * dP, axis=-1, keepdims=True) * linv
            dsc = (e * (dP - rd)) * (ln2 * linv)
            if causal_mask is None:
                # stop-gradient through the clamp: d exp2(min(sc, C))/dsc
                # = 0 where the forward clamped (sc is bit-identical to
                # the forward's, so the indicator matches exactly); the
                # causal path has no clamp and masked entries already
                # carry e = 0
                dsc = jnp.where(sc < NOMAX_CLAMP, dsc, 0.0)
            dsc = dsc.astype(dot_dtype)
            dq2 = dq2 + jnp.dot(dsc, k2,
                                preferred_element_type=jnp.float32) * (
                m * scale)
            dk2 = dk2 + jax.lax.dot_general(
                dsc, qm, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        attn_pair = attn_pair + bv2[None, :]
        attn_ref[j, :, p * PAIR_W:(p + 1) * PAIR_W] = attn_pair.astype(
            attn_ref.dtype)
        dqkv_cols.append((dq2.astype(dot_dtype), dk2.astype(dot_dtype),
                          dv2.astype(dot_dtype)))

    # assemble the packed [S, 3*H*D] dqkv once, then dxn = dqkv @ w_effT as
    # ONE full-width MXU dot instead of 3 slice-dots per pair (18 small
    # dots pipelined worse than one big one)
    dqkvb = jnp.concatenate(
        [c[q] for q in range(3) for c in dqkv_cols], axis=-1)
    dqkv_ref[j] = dqkvb.astype(dqkv_ref.dtype)
    dxn = jax.lax.dot_general(
        dqkvb, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dxl = rstd * (dxn - m1 - xn32 * m2)
    dx_ref[j] = (dxl + gof.astype(jnp.float32)).astype(dx_ref.dtype)


def _block_bwd_one_il(x_ref, g_ref, w_ref, b_ref, wo_ref, dx_ref, dqkv_ref,
                      xn_ref, attn_ref, j, *, eps, heads, head_dim, hp, ln2,
                      scale, dot_dtype, half_masks, causal_mask=None, il=2):
    """Stage-interleaved twin of _block_bwd_one (UML_BWD_IL=N, N>=2).

    The 2*(heads/2) per-(pair, half) backward chains of one image are
    independent until their accumulator adds, but _block_bwd_one traces
    them strictly one after another, so each chain's [S, S] softmax-
    backward VPU passes (exp2, e*(dP-rd)) sit between ITS OWN MXU dots
    with nothing to overlap against — tools/exp_bwd_attrib.py measures
    the composed dx chain ~60% over its MXU floor at bs512, and cross-
    image grouping (the forward's fix) is VMEM-infeasible in the
    backward (tools/exp_bwd_g512.py).  This variant advances ``il``
    chains from DIFFERENT head-pairs stage by stage, placing one chain's
    VPU stage adjacent in program order to another's MXU stage at a cost
    of ~il extra [S, S] fp32 temporaries (~0.3 MB each at S=197), so
    Mosaic's scheduler sees co-issuable work inside a single image.
    Math is identical op for op; only trace order differs."""
    xf = x_ref[j].astype(jnp.float32)                        # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xnb = xn32.astype(dot_dtype)
    xn_ref[j] = xnb.astype(xn_ref.dtype)

    qkv = jnp.dot(xnb, w_ref[:],
                  preferred_element_type=jnp.float32).astype(dot_dtype)
    gof = g_ref[j]
    dattn = jax.lax.dot_general(
        gof, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, H*D]

    s = xf.shape[0]
    npairs = heads // 2

    def sl(p):
        return slice(p * PAIR_W, (p + 1) * PAIR_W)

    dq2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]
    dk2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]
    dv2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]
    attn_pair = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]

    # groups mix different PAIRS (h-major order) so even chains sharing a
    # group have independent accumulators
    tasks = [(p, h) for h in range(2) for p in range(npairs)]
    for t0 in range(0, len(tasks), il):
        grp = tasks[t0:t0 + il]
        st = []
        for (p, h) in grp:                                   # MXU: scores
            m = half_masks[h]
            q2 = qkv[:, sl(p)]
            k2 = qkv[:, hp + p * PAIR_W: hp + (p + 1) * PAIR_W]
            bq2 = b_ref[sl(p)].astype(jnp.float32)
            qm = q2 * (m * scale).astype(dot_dtype) + (
                bq2[None, :] * scale * m).astype(dot_dtype)
            sc = jax.lax.dot_general(
                qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            st.append({"p": p, "m": m, "qm": qm, "k2": k2, "sc": sc})
        for t in st:                                         # VPU: softmax
            if causal_mask is not None:
                sc = jnp.where(causal_mask, t["sc"], -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                t["e"] = jnp.exp2(sc - mx)
                t["linv"] = 1.0 / jnp.sum(t["e"], axis=-1, keepdims=True)
            else:
                t["e"] = jnp.exp2(jnp.minimum(t["sc"], NOMAX_CLAMP))
                t["linv"] = 1.0 / jnp.maximum(
                    jnp.sum(t["e"], axis=-1, keepdims=True), 1e-30)
        for t in st:                                         # MXU: fwd out
            p, m = t["p"], t["m"]
            v2 = qkv[:, 2 * hp + p * PAIR_W: 2 * hp + (p + 1) * PAIR_W]
            t["vm"] = v2 * m.astype(dot_dtype)
            t["eb"] = t["e"].astype(dot_dtype)
            o = jnp.dot(t["eb"], t["vm"], preferred_element_type=jnp.float32)
            attn_pair[p] = attn_pair[p] + o * t["linv"]
        for t in st:                                         # MXU: dv
            p, m = t["p"], t["m"]
            t["dO"] = dattn[:, sl(p)] * m
            dOl = (t["dO"] * t["linv"]).astype(dot_dtype)
            dv2[p] = dv2[p] + jax.lax.dot_general(
                t["eb"], dOl, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * m
        for t in st:                                         # MXU: dP
            t["dP"] = jax.lax.dot_general(
                t["dO"].astype(dot_dtype), t["vm"],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
        for t in st:                                         # VPU: dsc
            e, linv = t["e"], t["linv"]
            rd = jnp.sum(e * t["dP"], axis=-1, keepdims=True) * linv
            dsc = (e * (t["dP"] - rd)) * (ln2 * linv)
            if causal_mask is None:
                dsc = jnp.where(t["sc"] < NOMAX_CLAMP, dsc, 0.0)
            t["dsc"] = dsc.astype(dot_dtype)
        for t in st:                                         # MXU: dq, dk
            p, m = t["p"], t["m"]
            dq2[p] = dq2[p] + jnp.dot(
                t["dsc"], t["k2"],
                preferred_element_type=jnp.float32) * (m * scale)
            dk2[p] = dk2[p] + jax.lax.dot_general(
                t["dsc"], t["qm"], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    for p in range(npairs):
        bv2 = b_ref[2 * hp + p * PAIR_W:
                    2 * hp + (p + 1) * PAIR_W].astype(jnp.float32)
        attn_ref[j, :, sl(p)] = (attn_pair[p] + bv2[None, :]).astype(
            attn_ref.dtype)
    dqkvb = jnp.concatenate(
        [c[q].astype(dot_dtype) for q in range(3)
         for c in zip(dq2, dk2, dv2)], axis=-1)
    dqkv_ref[j] = dqkvb.astype(dqkv_ref.dtype)
    dxn = jax.lax.dot_general(
        dqkvb, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dxl = rstd * (dxn - m1 - xn32 * m2)
    dx_ref[j] = (dxl + gof.astype(jnp.float32)).astype(dx_ref.dtype)


def _block_bwd_one_stash(x_ref, g_ref, qkv_ref, w_ref, b_ref, wo_ref,
                         dx_ref, dqkv_ref, xn_ref, j, *, eps, heads,
                         head_dim, hp, ln2, scale, dot_dtype, half_masks,
                         causal_mask=None):
    """_block_bwd_one with the forward-stashed qkv: skips the qkv
    recompute dot (2*S*K*3K MACs, ~30% of the backward's MXU work) and
    the per-pair e@v output recompute (~5% more — dwo contracts the
    forward-stashed attention output outside).  The stashed qkv is
    bit-identical to what the recompute produced (same dot, same cast),
    so every downstream value matches _block_bwd_one exactly."""
    xf = x_ref[j].astype(jnp.float32)                        # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xn_ref[j] = xn32.astype(xn_ref.dtype)

    qkv = qkv_ref[j]

    gof = g_ref[j]
    dattn = jax.lax.dot_general(
        gof, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, H*D]

    s = xf.shape[0]
    dqkv_cols = []
    for p in range(heads // 2):
        q2 = qkv[:, p * PAIR_W:(p + 1) * PAIR_W]
        k2 = qkv[:, hp + p * PAIR_W: hp + (p + 1) * PAIR_W]
        v2 = qkv[:, 2 * hp + p * PAIR_W: 2 * hp + (p + 1) * PAIR_W]
        bq2 = b_ref[p * PAIR_W:(p + 1) * PAIR_W].astype(jnp.float32)
        d_pair = dattn[:, p * PAIR_W:(p + 1) * PAIR_W]
        dq2 = jnp.zeros((s, PAIR_W), jnp.float32)
        dk2 = jnp.zeros((s, PAIR_W), jnp.float32)
        dv2 = jnp.zeros((s, PAIR_W), jnp.float32)
        for m in half_masks:
            ms = (m * scale).astype(dot_dtype)
            qm = q2 * ms + (bq2[None, :] * scale * m).astype(dot_dtype)
            sc = jax.lax.dot_general(
                qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            if causal_mask is not None:
                sc = jnp.where(causal_mask, sc, -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                e = jnp.exp2(sc - mx)                        # fp32
                linv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            else:
                e = jnp.exp2(jnp.minimum(sc, NOMAX_CLAMP))   # fp32
                linv = 1.0 / jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True), 1e-30)  # [S, 1]
            eb = e.astype(dot_dtype)
            vm = v2 * m.astype(dot_dtype)
            dO = d_pair * m                                  # [S, PAIR_W] f32
            dOl = (dO * linv).astype(dot_dtype)
            dv2 = dv2 + jax.lax.dot_general(
                eb, dOl, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * m
            dP = jax.lax.dot_general(
                dO.astype(dot_dtype), vm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            rd = jnp.sum(e * dP, axis=-1, keepdims=True) * linv
            dsc = (e * (dP - rd)) * (ln2 * linv)
            if causal_mask is None:
                dsc = jnp.where(sc < NOMAX_CLAMP, dsc, 0.0)
            dsc = dsc.astype(dot_dtype)
            dq2 = dq2 + jnp.dot(dsc, k2,
                                preferred_element_type=jnp.float32) * (
                m * scale)
            dk2 = dk2 + jax.lax.dot_general(
                dsc, qm, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dqkv_cols.append((dq2.astype(dot_dtype), dk2.astype(dot_dtype),
                          dv2.astype(dot_dtype)))

    dqkvb = jnp.concatenate(
        [c[q] for q in range(3) for c in dqkv_cols], axis=-1)
    dqkv_ref[j] = dqkvb.astype(dqkv_ref.dtype)
    dxn = jax.lax.dot_general(
        dqkvb, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dxl = rstd * (dxn - m1 - xn32 * m2)
    dx_ref[j] = (dxl + gof.astype(jnp.float32)).astype(dx_ref.dtype)


def _block_bwd_one_stash_il(x_ref, g_ref, qkv_ref, w_ref, b_ref, wo_ref,
                            dx_ref, dqkv_ref, xn_ref, j, *, eps, heads,
                            head_dim, hp, ln2, scale, dot_dtype,
                            half_masks, causal_mask=None, il=2):
    """Stage-interleaved twin of _block_bwd_one_stash (UML_BWD_IL=N):
    advances ``il`` (pair, half) chains stage by stage so one chain's
    [S, S] softmax-backward VPU passes sit adjacent in program order to
    another's MXU dots (see _block_bwd_one_il).  Math identical op for
    op; only trace order differs."""
    xf = x_ref[j].astype(jnp.float32)                        # [S, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xn32 = (xf - mean) * rstd
    xn_ref[j] = xn32.astype(xn_ref.dtype)

    qkv = qkv_ref[j]
    gof = g_ref[j]
    dattn = jax.lax.dot_general(
        gof, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [S, H*D]

    s = xf.shape[0]
    npairs = heads // 2

    def sl(p):
        return slice(p * PAIR_W, (p + 1) * PAIR_W)

    dq2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]
    dk2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]
    dv2 = [jnp.zeros((s, PAIR_W), jnp.float32) for _ in range(npairs)]

    tasks = [(p, h) for h in range(2) for p in range(npairs)]
    for t0 in range(0, len(tasks), il):
        grp = tasks[t0:t0 + il]
        st = []
        for (p, h) in grp:                                   # MXU: scores
            m = half_masks[h]
            q2 = qkv[:, sl(p)]
            k2 = qkv[:, hp + p * PAIR_W: hp + (p + 1) * PAIR_W]
            bq2 = b_ref[sl(p)].astype(jnp.float32)
            qm = q2 * (m * scale).astype(dot_dtype) + (
                bq2[None, :] * scale * m).astype(dot_dtype)
            sc = jax.lax.dot_general(
                qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
            st.append({"p": p, "m": m, "qm": qm, "k2": k2, "sc": sc})
        for t in st:                                         # VPU: softmax
            if causal_mask is not None:
                sc = jnp.where(causal_mask, t["sc"], -1e30)
                mx = jnp.max(sc, axis=-1, keepdims=True)
                t["e"] = jnp.exp2(sc - mx)
                t["linv"] = 1.0 / jnp.sum(t["e"], axis=-1, keepdims=True)
            else:
                t["e"] = jnp.exp2(jnp.minimum(t["sc"], NOMAX_CLAMP))
                t["linv"] = 1.0 / jnp.maximum(
                    jnp.sum(t["e"], axis=-1, keepdims=True), 1e-30)
        for t in st:                                         # MXU: dv
            p, m = t["p"], t["m"]
            v2 = qkv[:, 2 * hp + p * PAIR_W: 2 * hp + (p + 1) * PAIR_W]
            t["vm"] = v2 * m.astype(dot_dtype)
            t["eb"] = t["e"].astype(dot_dtype)
            t["dO"] = dattn[:, sl(p)] * m
            dOl = (t["dO"] * t["linv"]).astype(dot_dtype)
            dv2[p] = dv2[p] + jax.lax.dot_general(
                t["eb"], dOl, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * m
        for t in st:                                         # MXU: dP
            t["dP"] = jax.lax.dot_general(
                t["dO"].astype(dot_dtype), t["vm"],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [S, S]
        for t in st:                                         # VPU: dsc
            e, linv = t["e"], t["linv"]
            rd = jnp.sum(e * t["dP"], axis=-1, keepdims=True) * linv
            dsc = (e * (t["dP"] - rd)) * (ln2 * linv)
            if causal_mask is None:
                dsc = jnp.where(t["sc"] < NOMAX_CLAMP, dsc, 0.0)
            t["dsc"] = dsc.astype(dot_dtype)
        for t in st:                                         # MXU: dq, dk
            p, m = t["p"], t["m"]
            dq2[p] = dq2[p] + jnp.dot(
                t["dsc"], t["k2"],
                preferred_element_type=jnp.float32) * (m * scale)
            dk2[p] = dk2[p] + jax.lax.dot_general(
                t["dsc"], t["qm"], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    dqkvb = jnp.concatenate(
        [c[q].astype(dot_dtype) for q in range(3)
         for c in zip(dq2, dk2, dv2)], axis=-1)
    dqkv_ref[j] = dqkvb.astype(dqkv_ref.dtype)
    dxn = jax.lax.dot_general(
        dqkvb, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
    dxl = rstd * (dxn - m1 - xn32 * m2)
    dx_ref[j] = (dxl + gof.astype(jnp.float32)).astype(dx_ref.dtype)


def _block_bwd_stash_kernel(x_ref, g_ref, qkv_ref, w_ref, b_ref, wo_ref,
                            dx_ref, dqkv_ref, xn_ref, *,
                            eps, heads, head_dim, causal, il):
    hp = heads * head_dim
    log2e = 1.4426950408889634
    ln2 = 0.6931471805599453
    scale = head_dim ** -0.5 * log2e
    dot_dtype = w_ref.dtype

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_W), 1)
    half_masks = ((lane < head_dim).astype(jnp.float32),
                  (lane >= head_dim).astype(jnp.float32))
    s = x_ref.shape[1]
    causal_mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        causal_mask = cols <= rows
    one = (functools.partial(_block_bwd_one_stash_il, il=il) if il > 1
           else _block_bwd_one_stash)
    for j in range(x_ref.shape[0]):
        one(x_ref, g_ref, qkv_ref, w_ref, b_ref, wo_ref, dx_ref, dqkv_ref,
            xn_ref, j, eps=eps, heads=heads, head_dim=head_dim, hp=hp,
            ln2=ln2, scale=scale, dot_dtype=dot_dtype,
            half_masks=half_masks, causal_mask=causal_mask)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret", "il"))
def _block_bwd_stash_call(x, g, qkv, w_eff, b_eff, wo, eps, heads,
                          head_dim, causal, interpret, il=3):
    # il (stage interleave depth) is a STATIC jit arg resolved by the
    # caller (_bwd_via_kernel reads UML_BWD_IL) so the jit cache keys on
    # it — an env read inside the traced body would silently pin the
    # first-traced value for every later call of the same shape.
    # IL=3 default: on the REAL bs128 train step it reads 1301.9/1300.2
    # img/s vs 1285.2/1302.0 at IL=0 (tools/exp_train_il.py, alternated
    # same-window), and the tower A/Bs were directionally positive in
    # every window (103.94 ms vs 104.6-106.0 at bs128; neutral at bs512).
    bsz, s, k = x.shape
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    grp, cparams = _group_and_params(
        bsz, default_g=1, env="UML_BWD_G",
        need_fn=lambda g: fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g)
        + 2 * g * s * (2 * m3 + k) * x.dtype.itemsize)
    dx, dqkv, xn = pl.pallas_call(
        functools.partial(_block_bwd_stash_kernel, eps=eps, heads=heads,
                          head_dim=head_dim, causal=causal, il=il),
        grid=(bsz // grp,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, m3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, m3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # dx
            jax.ShapeDtypeStruct((bsz, s, m3), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # xn
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * m3 + 2 * bsz * s * hd * k
                   + 10 * bsz * heads * s * s * head_dim),
            bytes_accessed=((4 * bsz * s * k + 2 * bsz * s * m3)
                            * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, g, qkv, w_eff, b_eff, wo)
    return dx, dqkv, xn


def _block_bwd_cls_kernel(x_ref, g_ref, w_ref, b_ref, wo_ref,
                          dx_ref, dqkv_ref, xn_ref, attn_ref, *,
                          eps, heads, head_dim):
    """Backward of the CLS-only attention half-block without the
    zero-pad detour: the cotangent has CLS_ROWS live rows, so the score/
    softmax-backward tensors are [CLS_ROWS, S] instead of [S, S], the
    full-q recompute collapses to CLS_ROWS rows, and the fwd-out/dv/dk
    contractions contract over CLS_ROWS.  The zero-pad path computed
    exact zeros for everything beyond row CLS_ROWS (dO rows zero =>
    dsc/dq rows zero), so dropping them is bit-exact — per image the MXU
    work falls from the full layer backward's ~1171M MACs to ~500M (kv
    recompute + dxn dominate; every [S, S]-class dot is gone).

    dqkv keeps the full [S, 3*H*D] layout with the q section zero beyond
    row CLS_ROWS, so the XLA dW contractions are unchanged."""
    hp = heads * head_dim
    log2e = 1.4426950408889634
    ln2 = 0.6931471805599453
    scale = head_dim ** -0.5 * log2e
    dot_dtype = w_ref.dtype
    r = g_ref.shape[1]                                       # CLS_ROWS

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_W), 1)
    half_masks = ((lane < head_dim).astype(jnp.float32),
                  (lane >= head_dim).astype(jnp.float32))
    w_q = w_ref[:, :hp]
    w_kv = w_ref[:, hp:]
    for j in range(x_ref.shape[0]):
        xf = x_ref[j].astype(jnp.float32)                    # [S, K]
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
        rstd = jax.lax.rsqrt(var + eps)
        xn32 = (xf - mean) * rstd
        xnb = xn32.astype(dot_dtype)
        xn_ref[j] = xnb.astype(xn_ref.dtype)

        kv = jnp.dot(xnb, w_kv,
                     preferred_element_type=jnp.float32).astype(dot_dtype)
        q8 = jnp.dot(xnb[:r], w_q,
                     preferred_element_type=jnp.float32).astype(dot_dtype)

        g8 = g_ref[j]                                        # [r, K]
        dattn8 = jax.lax.dot_general(
            g8, wo_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [r, H*D]

        s = xf.shape[0]
        dq_cols, dk_cols, dv_cols = [], [], []
        for p in range(heads // 2):
            q2 = q8[:, p * PAIR_W:(p + 1) * PAIR_W]
            k2 = kv[:, p * PAIR_W:(p + 1) * PAIR_W]
            v2 = kv[:, hp + p * PAIR_W: hp + (p + 1) * PAIR_W]
            bq2 = b_ref[p * PAIR_W:(p + 1) * PAIR_W].astype(jnp.float32)
            bv2 = b_ref[2 * hp + p * PAIR_W:
                        2 * hp + (p + 1) * PAIR_W].astype(jnp.float32)
            d_pair = dattn8[:, p * PAIR_W:(p + 1) * PAIR_W]
            dq2 = jnp.zeros((r, PAIR_W), jnp.float32)
            dk2 = jnp.zeros((s, PAIR_W), jnp.float32)
            dv2 = jnp.zeros((s, PAIR_W), jnp.float32)
            attn_pair = jnp.zeros((r, PAIR_W), jnp.float32)
            for m in half_masks:
                ms = (m * scale).astype(dot_dtype)
                qm = q2 * ms + (bq2[None, :] * scale * m).astype(dot_dtype)
                sc = jax.lax.dot_general(
                    qm, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [r, S]
                e = jnp.exp2(jnp.minimum(sc, NOMAX_CLAMP))
                linv = 1.0 / jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True), 1e-30)
                eb = e.astype(dot_dtype)
                vm = v2 * m.astype(dot_dtype)
                o = jnp.dot(eb, vm, preferred_element_type=jnp.float32)
                attn_pair = attn_pair + o * linv
                dO = d_pair * m                              # [r, PAIR_W]
                dOl = (dO * linv).astype(dot_dtype)
                dv2 = dv2 + jax.lax.dot_general(
                    eb, dOl, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * m
                dP = jax.lax.dot_general(
                    dO.astype(dot_dtype), vm,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [r, S]
                rd = jnp.sum(e * dP, axis=-1, keepdims=True) * linv
                dsc = (e * (dP - rd)) * (ln2 * linv)
                dsc = jnp.where(sc < NOMAX_CLAMP, dsc, 0.0)
                dsc = dsc.astype(dot_dtype)
                dq2 = dq2 + jnp.dot(dsc, k2,
                                    preferred_element_type=jnp.float32) * (
                    m * scale)
                dk2 = dk2 + jax.lax.dot_general(
                    dsc, qm,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [S, PAIR_W]
            attn_pair = attn_pair + bv2[None, :]
            attn_ref[j, :, p * PAIR_W:(p + 1) * PAIR_W] = attn_pair.astype(
                attn_ref.dtype)
            dq_cols.append(dq2.astype(dot_dtype))
            dk_cols.append(dk2.astype(dot_dtype))
            dv_cols.append(dv2.astype(dot_dtype))

        dq8b = jnp.concatenate(dq_cols, axis=-1)             # [r, H*D]
        dkvb = jnp.concatenate(dk_cols + dv_cols, axis=-1)   # [S, 2*H*D]
        dqkv_ref[j, :, :hp] = jnp.concatenate(
            [dq8b, jnp.zeros((s - r, hp), dot_dtype)],
            axis=0).astype(dqkv_ref.dtype)
        dqkv_ref[j, :, hp:] = dkvb.astype(dqkv_ref.dtype)

        # dxn splits: the kv sections over all rows, the q section's
        # live CLS_ROWS only — the padded rows are exact zeros.  The
        # row-slice add is a concat (Mosaic has no scatter-add).
        dxn_kv = jax.lax.dot_general(
            dkvb, w_kv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [S, K]
        dxn_q8 = jax.lax.dot_general(
            dq8b, w_q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [r, K]
        dxn = jnp.concatenate([dxn_kv[:r] + dxn_q8, dxn_kv[r:]], axis=0)

        m1 = jnp.mean(dxn, axis=-1, keepdims=True)
        m2 = jnp.mean(dxn * xn32, axis=-1, keepdims=True)
        dxl = rstd * (dxn - m1 - xn32 * m2)
        gf = jnp.concatenate(
            [g8.astype(jnp.float32),
             jnp.zeros((s - r, xf.shape[1]), jnp.float32)], axis=0)
        dx_ref[j] = (dxl + gf).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "interpret"))
def _block_bwd_cls_call(x, g, w_eff, b_eff, wo, eps, heads, head_dim,
                        interpret):
    bsz, s, k = x.shape
    r = g.shape[1]
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    # the CLS backward holds double-buffered output tiles beyond the
    # forward footprint _fits_default_vmem models: dx [S,K], dqkv [S,3HD],
    # xn [S,K] and attn [r,HD] — without counting them the g_==1 fast
    # path could admit shapes that exceed Mosaic's 16 MB scoped default
    # (a compile-time failure on larger towers)
    out_tile = lambda g_: 2 * g_ * (s * (2 * k + m3) + r * hd) \
        * x.dtype.itemsize
    grp, cparams = _group_and_params(
        bsz, default_g=1, env="UML_BWD_G",
        need_fn=lambda g_: None if (g_ == 1 and _fits_default_vmem(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True,
            extra=out_tile(1)))
        else fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g_)
        + out_tile(g_))
    dx, dqkv, xn, attn = pl.pallas_call(
        functools.partial(_block_bwd_cls_kernel, eps=eps, heads=heads,
                          head_dim=head_dim),
        grid=(bsz // grp,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, r, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, m3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, r, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # dx
            jax.ShapeDtypeStruct((bsz, s, m3), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # xn
            jax.ShapeDtypeStruct((bsz, r, hd), x.dtype),   # attn (CLS rows)
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * bsz * s * k * (m3 - hd) + 4 * bsz * r * k * hd
                   + 2 * bsz * s * hd * k
                   + 10 * bsz * heads * r * s * head_dim),
            bytes_accessed=((3 * bsz * s * k + bsz * s * m3)
                            * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * r * s,
        ),
        interpret=interpret,
    )(x, g, w_eff, b_eff, wo)
    return dx, dqkv, xn, attn


@functools.partial(jax.jit, static_argnames=(
    "eps", "heads", "head_dim", "causal", "interpret", "il"))
def _block_bwd_call(x, g, w_eff, b_eff, wo, eps, heads, head_dim,
                    causal, interpret, il=0):
    # il: static jit arg resolved by the caller (see _block_bwd_stash_call)
    bsz, s, k = x.shape
    m3 = w_eff.shape[1]
    hd = heads * head_dim
    grp, cparams = _group_and_params(
        bsz, default_g=1, env="UML_BWD_G",
        need_fn=lambda g: None if (g == 1 and _fits_default_vmem(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True))
        else fused_block_vmem_bytes(
            k, heads, head_dim, s, w_eff.dtype.itemsize, True, g)
        + 2 * g * s * (m3 + hd) * x.dtype.itemsize)
    dx, dqkv, xn, attn = pl.pallas_call(
        functools.partial(_block_bwd_kernel, eps=eps, heads=heads,
                          head_dim=head_dim, causal=causal, il=il),
        grid=(bsz // grp,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m3,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hd, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, m3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, s, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # dx
            jax.ShapeDtypeStruct((bsz, s, m3), x.dtype),   # dqkv
            jax.ShapeDtypeStruct((bsz, s, k), x.dtype),    # xn
            jax.ShapeDtypeStruct((bsz, s, hd), x.dtype),   # attn
        ],
        cost_estimate=pl.CostEstimate(
            flops=(4 * bsz * s * k * m3 + 2 * bsz * s * hd * k
                   + 12 * bsz * heads * s * s * head_dim),
            bytes_accessed=((5 * bsz * s * k + bsz * s * (m3 + hd))
                            * x.dtype.itemsize
                            + (w_eff.size + wo.size) * w_eff.dtype.itemsize),
            transcendentals=bsz * heads * s * s,
        ),
        interpret=interpret,
    )(x, g, w_eff, b_eff, wo)
    return dx, dqkv, xn, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fused_block(x, w_eff, b_eff, wo, bo, heads, head_dim, causal, eps):
    interpret = jax.default_backend() == "cpu"
    return _block_fwd(x, w_eff, b_eff, wo, bo, eps, heads,
                      head_dim, causal, interpret)


def _fused_block_fwd(x, w_eff, b_eff, wo, bo, heads, head_dim, causal, eps):
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and _stash_enabled() and not causal:
        out, qkv, attn = _block_fwd_stash(x, w_eff, b_eff, wo, bo, eps,
                                          heads, head_dim, causal, False)
        return out, (x, w_eff, b_eff, wo, bo, qkv, attn)
    return (_fused_block(x, w_eff, b_eff, wo, bo, heads, head_dim, causal,
                         eps),
            (x, w_eff, b_eff, wo, bo, None, None))


def _bwd_via_kernel(x, g, w_eff, b_eff, wo, bo, heads, head_dim, eps,
                    causal=False, qkv=None, attn=None):
    """Assemble all five grads from the Pallas backward's outputs: dx
    directly, the weight/bias grads as large 2-dim-contraction XLA dots
    over the saved (xn, dqkv, attn).  With forward-stashed ``qkv``/
    ``attn`` the backward kernel skips their recompute (the qkv dot is
    ~30% of the backward's MXU work) and dwo contracts the stash."""
    if qkv is not None:
        il = int(os.environ.get("UML_BWD_IL", "3"))
        dx, dqkv, xn = _block_bwd_stash_call(
            x, g, qkv, w_eff, b_eff, wo, eps, heads, head_dim, causal,
            False, il=il)
    else:
        il = int(os.environ.get("UML_BWD_IL", "0"))
        dx, dqkv, xn, attn = _block_bwd_call(x, g, w_eff, b_eff, wo, eps,
                                             heads, head_dim, causal, False,
                                             il=il)
    nums = (((0, 1), (0, 1)), ((), ()))   # contract (batch, seq)
    dw_eff = jax.lax.dot_general(xn, dqkv, nums,
                                 preferred_element_type=jnp.float32)
    db_eff = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    dwo = jax.lax.dot_general(attn, g, nums,
                              preferred_element_type=jnp.float32)
    dbo = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return (dx, dw_eff.astype(w_eff.dtype), db_eff.astype(b_eff.dtype),
            dwo.astype(wo.dtype), dbo.astype(bo.dtype))


def _fused_block_bwd(heads, head_dim, causal, eps, res, g):
    x, w_eff, b_eff, wo, bo, qkv, attn = res
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # hand-written Pallas backward (see _block_bwd_kernel) for both
        # the vision and the causal (text-tower) paths — the latter only
        # matters when the text tower is unfrozen, but costs 2x through
        # the jnp-twin recompute when it is
        return _bwd_via_kernel(x, g, w_eff, b_eff, wo, bo, heads,
                               head_dim, eps, causal, qkv=qkv, attn=attn)
    _, vjp = jax.vjp(
        lambda x, w_eff, b_eff, wo, bo: _raw_block_reference(
            x, w_eff, b_eff, wo, bo, heads=heads, causal=causal, eps=eps),
        x, w_eff, b_eff, wo, bo)
    return vjp(g)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_block_cls(x, w_eff, b_eff, wo, bo, heads, head_dim, eps):
    interpret = jax.default_backend() == "cpu"
    return _block_cls_fwd(x, w_eff, b_eff, wo, bo, eps, heads, head_dim,
                          interpret)


def _fused_block_cls_fwd(x, w_eff, b_eff, wo, bo, heads, head_dim, eps):
    return (_fused_block_cls(x, w_eff, b_eff, wo, bo, heads, head_dim, eps),
            (x, w_eff, b_eff, wo, bo))


def _fused_block_cls_bwd(heads, head_dim, eps, res, g):
    x, w_eff, b_eff, wo, bo = res
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and os.environ.get("UML_CLS_BWD", "cls") == "cls":
        # dedicated CLS backward: the cotangent has CLS_ROWS live rows,
        # so every [S, S]-class dot and the full-q recompute collapse to
        # CLS_ROWS — bit-exact vs the zero-pad path (which produced
        # exact zeros for the dropped work) at ~2.3x less MXU work
        dx, dqkv, xn, attn = _block_bwd_cls_call(
            x, g, w_eff, b_eff, wo, eps, heads, head_dim, False)
        nums = (((0, 1), (0, 1)), ((), ()))
        dw_eff = jax.lax.dot_general(xn, dqkv, nums,
                                     preferred_element_type=jnp.float32)
        db_eff = jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
        dwo = jax.lax.dot_general(attn, g, nums,
                                  preferred_element_type=jnp.float32)
        dbo = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
        return (dx, dw_eff.astype(w_eff.dtype), db_eff.astype(b_eff.dtype),
                dwo.astype(wo.dtype), dbo.astype(bo.dtype))
    if on_tpu:
        # zero-pad fallback (UML_CLS_BWD=pad): the vjp of a row slice is
        # a zero-pad of the cotangent, so the full-block Pallas backward
        # serves the CLS block too
        g_full = jnp.zeros(x.shape, g.dtype).at[:, :CLS_ROWS].set(g)
        return _bwd_via_kernel(x, g_full, w_eff, b_eff, wo, bo, heads,
                               head_dim, eps)
    _, vjp = jax.vjp(
        lambda x, w_eff, b_eff, wo, bo: _raw_block_reference(
            x, w_eff, b_eff, wo, bo, heads=heads, causal=False,
            eps=eps)[:, :CLS_ROWS],
        x, w_eff, b_eff, wo, bo)
    return vjp(g)


_fused_block_cls.defvjp(_fused_block_cls_fwd, _fused_block_cls_bwd)


def _resolve_block_impl(impl, x, d, heads, wo, min_seq=0):
    """Shared auto-dispatch for the half-block kernels: Pallas on TPU
    when the shapes fit (``min_seq`` lets the CLS variant reject models
    shorter than its fixed CLS_ROWS output tile)."""
    if impl != "auto":
        return impl
    k = x.shape[-1]
    on_tpu = jax.default_backend() not in ("cpu",)
    ok = (on_tpu and x.ndim == 3 and heads * d == wo.shape[0]
          and wo.shape[1] == k and x.shape[1] >= min_seq
          and supports_fused_attention(k, heads, d, x.shape[1],
                                       with_proj=True))
    return "pallas" if ok else "reference"


def ln_attn_block_cls(x, scale, bias, kernel, kbias, wo, bo, *, heads: int,
                      eps: float = 1e-5, impl: str = "auto"):
    """(x + MHA(LN(x)) @ wo + bo)[:, :CLS_ROWS]: the attention half of the
    FINAL pre-LN block when only the CLS token is consumed downstream
    (encode_image without return_tokens, engine/clip/model.py:231-239).

    Row 0 matches ln_attn_block's row 0 exactly (same dots, same
    contraction order); rows 1..7 are sublane padding.  Non-causal only.
    Output is always [B, CLS_ROWS, K]: when S < CLS_ROWS (reference impl
    only — the Pallas gate requires S >= CLS_ROWS) rows S..CLS_ROWS-1 are
    zero padding, so both impls agree on shape for every S.
    """
    d = kernel.shape[1] // (3 * heads)
    impl = _resolve_block_impl(impl, x, d, heads, wo, min_seq=CLS_ROWS)
    if impl == "pallas":
        w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
        return _fused_block_cls(x, w_eff, b_eff, wo, bo, heads, d, eps)
    out = ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                  heads=heads, causal=False,
                                  eps=eps)[:, :CLS_ROWS]
    if out.shape[1] < CLS_ROWS:
        out = jnp.pad(out, ((0, 0), (0, CLS_ROWS - out.shape[1]), (0, 0)))
    return out


def fold_ln_into_matmul(scale, bias, kernel, kbias):
    """Fold LN affine params into the following matmul's weights:
    (xn*scale + bias) @ W + b  ==  xn @ (scale*W) + (b + bias@W).

    Fold math runs in fp32; ``w_eff`` is cast back to the weight dtype.
    Gradients to scale/bias/kernel/kbias flow through these XLA ops (the
    Pallas custom_vjp only sees the folded tensors).
    """
    kf = kernel.astype(jnp.float32)
    w_eff = (scale.astype(jnp.float32)[:, None] * kf).astype(kernel.dtype)
    b_eff = kbias.astype(jnp.float32) + bias.astype(jnp.float32) @ kf
    return w_eff, b_eff


def ln_attn_block(x, scale, bias, kernel, kbias, wo, bo, *, heads: int,
                  causal: bool = False, eps: float = 1e-5,
                  impl: str = "auto"):
    """x + (MHA(LN(x)) @ wo + bo): the full attention half of a pre-LN
    residual block in one Pallas program per batch entry.

    Extends ln_qkv_attention with the out-projection and the residual add:
    the attention output and the projection delta stay VMEM-resident, so
    per layer one kernel replaces a kernel + an XLA matmul + HBM
    round-trips of the attention tile.  The LN scale/bias are folded into
    the QKV weights outside the kernel.  ``wo``: [H*D, K]; ``bo``: [K].
    """
    d = kernel.shape[1] // (3 * heads)
    impl = _resolve_block_impl(impl, x, d, heads, wo)
    if impl == "pallas":
        w_eff, b_eff = fold_ln_into_matmul(scale, bias, kernel, kbias)
        return _fused_block(x, w_eff, b_eff, wo, bo, heads, d, causal, eps)
    return ln_attn_block_reference(x, scale, bias, kernel, kbias, wo, bo,
                                   heads=heads, causal=causal, eps=eps)


def ln_qkv_attention(x, scale, bias, kernel, kbias, *, heads: int,
                     causal: bool = False, eps: float = 1e-5,
                     impl: str = "auto"):
    """LN(x) -> packed QKV -> MHA, qkv/scores VMEM-resident.

    Output is the reference [B, S, H*D] layout on every path.
    """
    k = x.shape[-1]
    d = kernel.shape[1] // (3 * heads)
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = ("pallas" if on_tpu and x.ndim == 3
                and supports_fused_attention(k, heads, d, x.shape[1])
                else "reference")
    if impl == "pallas":
        return _fused(x, scale, bias, kernel, kbias, heads, d, causal, eps)
    return ln_qkv_attention_reference(x, scale, bias, kernel, kbias,
                                      heads=heads, causal=causal, eps=eps)
