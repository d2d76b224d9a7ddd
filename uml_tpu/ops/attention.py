"""Multi-head attention: Pallas TPU flash kernel + jnp reference.

The reference delegates attention to torch ``nn.MultiheadAttention``
(engine/clip/model.py:171, MultiBench/models.py:59-60).  Here the hot path is
a Pallas flash-attention kernel (online-softmax, never materializing the
[S, S] score matrix in HBM) shaped for the workloads this framework runs:
ViT-B/16 (S=197), CLIP text (S=77), MultiBench sequences (S<=128) — small
sequences at large batch, so the kernel runs one fused program per
(batch*heads) slice with KV streamed through VMEM in 128-wide blocks.

Layout: [B, H, S, D] with D <= 128 (head dim 64 for all reference models).
Softmax statistics accumulate in fp32 regardless of input dtype.

Backward: ``multi_head_attention`` wraps the kernel in a custom_vjp whose
backward recomputes through the jnp reference — XLA-fused, exact, and cheap
at these sequence lengths; a handwritten backward kernel is a later-round
optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def mha_reference(q, k, v, *, causal: bool = False, mask=None):
    """jnp attention. q,k,v: [B, H, S, D]; mask: additive [S, S] or None.

    The [S, S] score tensor is stored in the INPUT dtype (953 MB/layer in
    f32 at ViT-B/16 bs512 — the forward's single largest HBM stream, halved
    in bf16), while the max-subtraction/exp/normalize math runs in fp32.
    The reference torch CLIP runs nn.MultiheadAttention entirely in fp16
    (model.py:171 under model.half()), so half-precision score storage with
    fp32 softmax math is strictly *more* precise than the reference.
    """
    d = q.shape[-1]
    neg = jnp.asarray(-jnp.inf if q.dtype == jnp.bfloat16 else _NEG_INF,
                      q.dtype)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=q.dtype) * jnp.asarray(
                            d**-0.5, q.dtype)
    if causal:
        s = q.shape[2]
        causal_mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(causal_mask, scores, neg)
    if mask is not None:
        scores = (scores.astype(jnp.float32)
                  + mask.astype(jnp.float32)).astype(scores.dtype)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32))
    weights = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(q.dtype), v)


def dense_attention_bshd(q, k, v, *, causal: bool = False):
    """Layout-preserving dense attention: q,k,v AND output are [B, S, H, D].

    The (b, h) axes stay where the packed-QKV reshape leaves them — XLA
    folds them into dot_general batch dims instead of materializing a
    [B, S, 3HD] -> [3, B, H, S, D] transpose.  Same score-storage scheme
    as mha_reference: scores kept in the input dtype, softmax math in fp32.
    """
    d = q.shape[-1]
    neg = jnp.asarray(-jnp.inf if q.dtype == jnp.bfloat16 else _NEG_INF,
                      q.dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k,
        preferred_element_type=q.dtype) * jnp.asarray(d**-0.5, q.dtype)
    if causal:
        s = q.shape[1]
        causal_mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(causal_mask, scores, neg)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp((scores - m).astype(jnp.float32))
    weights = e / jnp.sum(e, axis=-1, keepdims=True)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_len, causal):
    """One (batch*head, q_block) program: stream KV blocks with online softmax.

    q_ref: [BQ, D]; k_ref/v_ref: [S_pad, D]; o_ref: [BQ, D].
    """
    qi = pl.program_id(1)
    block_q = q_ref.shape[0]
    s_pad = k_ref.shape[0]
    num_k_blocks = s_pad // block_k

    q = q_ref[:].astype(jnp.float32) * scale
    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]

        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = col_ids < seq_len
        if causal:
            valid = jnp.logical_and(valid, col_ids <= row_ids)
        s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    if causal:
        # process only KV blocks that intersect the causal triangle
        last_block = (qi * block_q + block_q - 1) // block_k + 1
        n_iter = jnp.minimum(last_block, num_k_blocks)
    else:
        n_iter = num_k_blocks

    acc0 = jnp.zeros((block_q, q_ref.shape[1]), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_iter, body, (acc0, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k"))
def flash_attention(q, k, v, *, causal: bool = False, block_q: int = 128,
                    block_k: int = 128):
    """Pallas flash attention. q,k,v: [B, H, S, D] -> [B, H, S, D]."""
    b, h, s, d = q.shape
    scale = d**-0.5

    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    bh = b * h
    qf = q.reshape(bh, s_pad, d)
    kf = k.reshape(bh, s_pad, d)
    vf = v.reshape(bh, s_pad, d)

    grid = (bh, s_pad // block_q)
    # interpret mode lets the same kernel run (slowly) on CPU for testing
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, seq_len=s, causal=causal
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s_pad * s_pad * d,
            bytes_accessed=3 * bh * s_pad * d * q.dtype.itemsize
            + bh * s_pad * d * q.dtype.itemsize,
            transcendentals=bh * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, s_pad, d)
    return out[:, :, :s, :] if s_pad != s else out


# ---------------------------------------------------------------------------
# public op: pallas forward, reference-math backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha(q, k, v, causal):
    return flash_attention(q, k, v, causal=causal)


def _mha_fwd(q, k, v, causal):
    return flash_attention(q, k, v, causal=causal), (q, k, v)


def _mha_bwd(causal, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: mha_reference(q, k, v, causal=causal), q, k, v)
    return vjp(g)


_mha.defvjp(_mha_fwd, _mha_bwd)


# Below this sequence length, XLA's batched dense attention beats the
# per-(B*H) flash kernel on TPU (measured on v5e: ViT-B/16 S=197 runs
# 2143 img/s dense vs 1298 img/s flash — the [S, S] scores fit in VMEM and
# dense keeps the MXU fed with one big batched matmul).  Flash wins once
# the scores stop fitting: at S=2048 causal (B8 H16 D64) flash measures
# 29.4 ms vs dense 34.7 ms incl. ~28 ms fixed dispatch overhead — roughly
# 3x faster on-chip.
_FLASH_MIN_SEQ = 1024


def multi_head_attention(q, k, v, *, causal: bool = False, impl: str = "auto"):
    """Attention entry point. impl: 'auto' | 'pallas' | 'reference'.

    'auto' picks by measurement: dense XLA attention for short sequences
    (every reference workload: ViT 197, text 77, MultiBench <=128), the
    Pallas flash kernel on TPU for long ones.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        impl = "pallas" if (on_tpu and q.shape[2] >= _FLASH_MIN_SEQ) else "reference"
    if impl == "pallas":
        return _mha(q, k, v, causal)
    return mha_reference(q, k, v, causal=causal)
