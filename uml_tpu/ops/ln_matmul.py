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

Forward: Pallas kernel (TPU).  Backward: custom_vjp recomputing through the
jnp reference — exact, XLA-fused, cheap at these shapes.  Statistics are
fp32 regardless of input dtype; the normalized activation is cast to the
weight dtype before hitting the MXU (bf16 in production).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ln_matmul_reference(x, scale, bias, w, b, *, eps: float = 1e-5):
    """jnp reference: fp32-stats LN over the last axis, then x_n @ w + b.

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
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _ln_matmul_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)                       # [BN, K]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    out = jnp.dot(xn.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)       # [BN, M]
    o_ref[:] = (out + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _ln_matmul_kernel_3d(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *,
                         eps):
    """Per-batch-entry program: x_ref [S, K] (a squeezed [1, S, K] block)."""
    _ln_matmul_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, eps=eps)


def _quick_gelu_f32(x):
    return x * (1.0 / (1.0 + jnp.exp(-1.702 * x)))


def _gelu_exact_f32(x):
    # erf-based GELU (DINO uses nn.gelu(approximate=False))
    return x * 0.5 * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


_ACTIVATIONS = {None: lambda x: x, "quick_gelu": _quick_gelu_f32,
                "gelu_exact": _gelu_exact_f32}


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
    out = _ACTIVATIONS[activation](out)
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


@functools.partial(jax.jit, static_argnames=("eps", "block_b", "interpret"))
def _ln_matmul_fwd_3d(x, scale, bias, w, b, eps, block_b, interpret):
    """3D entry: x [B, S, K] -> [B, S, M], grid over the batch dim.

    Avoids the [B, S, K] -> [B*S, K] reshape a 2D kernel would force: with
    S not a multiple of the sublane tile (ViT's S=197), that reshape is a
    real repacking pass (measured +81 ms at bs512 across 24 call sites).
    """
    bsz, s, k = x.shape
    m = w.shape[1]
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel_3d, eps=eps),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((None, s, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, s, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, s, m), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * s * k * m,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + bsz * s * m * x.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, scale, bias, w, b)
    return out


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def _ln_matmul_fwd_impl(x, scale, bias, w, b, eps, block_n, interpret):
    n, k = x.shape
    m = w.shape[1]
    n_pad = _round_up(n, block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
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
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, scale, bias, w, b)
    return out[:n] if n_pad != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ln_matmul(x, scale, bias, w, b, eps):
    interpret = jax.default_backend() == "cpu"
    if x.ndim == 3:
        return _ln_matmul_fwd_3d(x, scale, bias, w, b, eps, 1, interpret)
    return _ln_matmul_fwd_impl(x, scale, bias, w, b, eps, 256, interpret)


def _ln_matmul_fwd(x, scale, bias, w, b, eps):
    return _ln_matmul(x, scale, bias, w, b, eps), (x, scale, bias, w, b)


def _ln_matmul_bwd(eps, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda x, scale, bias, w, b: ln_matmul_reference(
            x, scale, bias, w, b, eps=eps),
        x, scale, bias, w, b)
    return vjp(g)


_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def supports_ln_matmul(k: int, m: int) -> bool:
    """Kernel engages only for MXU-friendly shapes that fit VMEM:
    lane dims multiples of 128 and a resident [K, M] weight block."""
    return k % 128 == 0 and m % 128 == 0 and k * m * 2 <= 8 * 1024 * 1024


def ln_matmul(x, scale, bias, w, b, *, eps: float = 1e-5, impl: str = "auto"):
    """LayerNorm(x) @ w + b over the last axis of x.

    x: [..., K] (any leading dims); scale/bias: [K]; w: [K, M]; b: [M].
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
        return _ln_matmul(x, scale, bias, w, b, eps)
    return ln_matmul_reference(x, scale, bias, w, b, eps=eps)
