"""Microbatch gradient accumulation for full-model train steps.

Big-batch full-model finetune steps (reference finetune.py:181-193 runs
bs=64; the bench's composition-friendly extra is bs512) hit a memory
wall before a compute one: the forward-stash backwards
(ops.fused_attention UML_BWD_STASH, ops.ln_matmul UML_MLP_STASH) hold
[S, 3HD] + [S, 4K] per image per layer, which fits HBM comfortably at
bs<=~256 on a 16 GB v5e but not at bs512 — round 4 memory-gated the MLP
stash off there, and the un-stashed backward made bs512 SLOWER per
image than bs128.

The TPU-first fix is shape-level, not kernel-level: run the step as a
`lax.scan` over microbatches of the stash-friendly size, accumulating
gradients in fp32, and apply the optimizer once.  Each microbatch
executes the exact bs128-shaped program (stashes ON), so the big batch
inherits the small batch's per-image rate; the semantics are the
standard mean-of-means identity (equal microbatches, mean-reduced
loss), the same contract as torch gradient accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["microbatched_value_and_grad", "pick_microbatch"]


def pick_microbatch(batch: int, seq_len: int, hidden3: int, mlp_width: int,
                    itemsize: int = 2) -> int:
    """Largest divisor of ``batch`` whose per-layer forward-stash
    footprint (attention qkv [S,3HD] + MLP pre [S,4K], see
    ops.fused_attention._stash_enabled / ops.ln_matmul._mlp_stash_enabled)
    stays under the MLP stash gate — the size at which the fast stashed
    backward still runs.  Returns ``batch`` itself when it already fits
    (no accumulation)."""
    from uml_tpu.ops.ln_matmul import MLP_STASH_MAX_BYTES

    per_img = seq_len * max(hidden3, mlp_width) * itemsize
    if batch * per_img <= MLP_STASH_MAX_BYTES:
        return batch
    return next((d for d in range(batch // 2, 0, -1)
                 if batch % d == 0 and d * per_img <= MLP_STASH_MAX_BYTES),
                1)


def microbatched_value_and_grad(loss_fn, microbatch: int):
    """``jax.value_and_grad(loss_fn)`` over microbatch slices.

    ``loss_fn(params, *batch_args) -> scalar`` must MEAN-reduce over its
    batch axis (axis 0 of every ``batch_args`` entry), the convention of
    every loss in this repo (train/supervised.py, bench.py).  Returns
    ``fn(params, *batch_args) -> (loss, grads)`` where the batch axis of
    each arg is split into ``n = B // microbatch`` equal slices
    (``B % microbatch == 0`` required), scanned with fp32 grad
    accumulation, and mean-combined — numerically the mean-of-means
    identity with the full-batch step.

    When ``microbatch`` >= the incoming batch this is plain
    ``value_and_grad`` (no scan, zero overhead)."""
    vg = jax.value_and_grad(loss_fn)

    def fn(params, *batch_args):
        b = batch_args[0].shape[0]
        if microbatch >= b:
            return vg(params, *batch_args)
        assert b % microbatch == 0, (b, microbatch)
        n = b // microbatch
        chunked = tuple(a.reshape(n, microbatch, *a.shape[1:])
                        for a in batch_args)

        def body(carry, chunk):
            loss_acc, grad_acc = carry
            loss, grads = vg(params, *chunk)
            grad_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), grad_acc, grads)
            return (loss_acc + loss.astype(jnp.float32), grad_acc), None

        zero = (jnp.float32(0.0),
                jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                             params))
        (loss_sum, grad_sum), _ = jax.lax.scan(body, zero, chunked)
        inv = jnp.float32(1.0 / n)
        grads = jax.tree.map(
            lambda p, g: (g * inv).astype(p.dtype), params, grad_sum)
        return loss_sum * inv, grads

    return fn
