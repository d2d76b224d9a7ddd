"""Shared causal Transformer autoencoder for self-supervised UML (MultiBench).

Capability parity with MultiBench/models.py:
  * ``Linear`` projections with torch defaults (bias, optional xavier)
  * ``SeqTransformer`` == reference ``Transformer`` (models.py:39-127):
    Conv1d(k=1, no bias) input embed (== a bias-free Dense), optional
    learnable/sinusoidal positional embeddings capped at max_len, torch
    ``nn.TransformerEncoderLayer`` semantics — post-LN, ReLU MLP with
    dim_feedforward=2048, dropout 0.1 on attention/MLP outputs — causal
    mask + key-padding mask, optional last-valid-step pooling (out_last)
  * masked ``MSE`` (models.py:129-143) and ``SequenceInfoNCELoss``
    (temperature 0.07, in-batch negatives over valid tokens, :145-175) —
    the InfoNCE is computed with fixed shapes and -inf masking of padded
    targets instead of boolean gathers (XLA-friendly)
  * ``SeqUML`` == reference ``UML`` (models.py:178-278): shared encoder
    over per-modality projections, next-step prediction loss
    ``critic(recon[:, :-1], x[:, 1:])``, ``loss_private`` = summed squared
    mean cross-correlation of residuals, ``diff_next`` diagnostics,
    ``get_embedding`` mean-pool
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from uml_tpu.ops.attention import mha_reference


def length_mask(lengths, seq_len):
    """[B] lengths -> bool [B, T] valid mask."""
    return jnp.arange(seq_len)[None, :] < lengths[:, None]


def masked_mse(predictions, targets, mask=None):
    """Parity with models.py:129-143."""
    if mask is None:
        return jnp.mean((predictions - targets) ** 2)
    # denominator counts mask *elements* after broadcast over the feature
    # dim, matching the reference's expand_as (models.py:142-143)
    m = jnp.broadcast_to(mask[..., None], targets.shape).astype(predictions.dtype)
    return jnp.sum((predictions - targets) ** 2 * m) / (jnp.sum(m) + 1e-8)


def sequence_info_nce(predictions, targets, mask=None, temperature=0.07):
    """In-batch InfoNCE over valid tokens (models.py:145-175), fixed-shape.

    predictions/targets: [B, T, D]; mask: bool [B, T] (True = valid).
    """
    b, t, d = predictions.shape
    preds = predictions.reshape(b * t, d)
    targs = targets.reshape(b * t, d)
    valid = (jnp.ones(b * t, bool) if mask is None
             else mask.reshape(b * t))

    preds = preds / (jnp.linalg.norm(preds, axis=-1, keepdims=True) + 1e-12)
    targs = targs / (jnp.linalg.norm(targs, axis=-1, keepdims=True) + 1e-12)
    logits = preds @ targs.T / temperature
    # padded targets are not legal negatives; keep each row's own positive
    neg_mask = valid[None, :] | jnp.eye(b * t, dtype=bool)
    logits = jnp.where(neg_mask, logits, -1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.diag(logp)
    w = valid.astype(predictions.dtype)
    return jnp.sum(per_row * w) / (jnp.sum(w) + 1e-8)


class TorchEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer semantics (post-LN, ReLU)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True):
        assert self.d_model % self.nhead == 0, (
            f"d_model ({self.d_model}) must be divisible by nhead "
            f"({self.nhead}) — pick zdim as a multiple of 5")
        b, t, _ = x.shape
        h = self.nhead
        dh = self.d_model // h

        qkv = nn.Dense(3 * self.d_model, name="qkv")(x)
        qkv = qkv.reshape(b, t, 3, h, dh).transpose(2, 0, 3, 1, 4)
        attn = mha_reference(qkv[0], qkv[1], qkv[2], mask=attn_mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, self.d_model)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        y = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.d_model, name="linear2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


class SeqTransformer(nn.Module):
    """Reference ``Transformer`` (models.py:39-127), batch-major."""

    n_features: int
    dim: int
    nhead: int = 5
    num_layers: int = 5
    conv1d: bool = True
    out_last: bool = True
    pos_embd: bool = False
    pos_learnable: bool = False
    max_len: int = 128
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        b, t, _ = x.shape
        if self.conv1d:
            # Conv1d(kernel_size=1, bias=False) == bias-free Dense per step
            x = nn.Dense(self.dim, use_bias=False, name="embed")(x)

        if self.pos_embd:
            t_eff = min(t, self.max_len)
            x = x[:, :t_eff]
            t = t_eff
            if self.pos_learnable:
                table = self.param("pos_embedding",
                                   nn.initializers.normal(1.0),
                                   (self.max_len, self.dim))
            else:
                position = jnp.arange(self.max_len)[:, None]
                div = jnp.exp(jnp.arange(0, self.dim, 2)
                              * (-math.log(10000.0) / self.dim))
                table = jnp.zeros((self.max_len, self.dim))
                table = table.at[:, 0::2].set(jnp.sin(position * div))
                table = table.at[:, 1::2].set(jnp.cos(position * div))
            x = x + table[:t][None]

        # additive mask: causal + key padding (-inf on padded keys)
        causal = jnp.where(
            jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf)[None, None]
        mask = causal
        if lengths is not None:
            pad = jnp.where(length_mask(lengths, t), 0.0, -jnp.inf)
            mask = causal + pad[:, None, None, :]
        # rows that are fully masked (padded queries attending over padded
        # prefix can't happen under causality since position<=length; safe)

        for i in range(self.num_layers):
            x = TorchEncoderLayer(self.dim, self.nhead, dropout=self.dropout,
                                  name=f"layers_{i}")(
                x, attn_mask=mask, deterministic=deterministic)

        if self.out_last:
            if lengths is not None:
                idx = jnp.clip(lengths - 1, 0, t - 1)
                return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
            return x[:, -1]
        return x


class SeqUML(nn.Module):
    """Reference ``UML`` (models.py:178-278).

    forward(x, y, x_lengths, y_lengths) -> dict of losses + activations.
    """

    xdim: int
    ydim: int
    zdim: int
    nhead: int = 5
    num_layers: int = 5
    pos_embd: bool = False
    pos_learnable: bool = False
    max_len: int = 128
    info_nce: bool = False

    def setup(self):
        self.xproj_in = nn.Dense(self.zdim, name="xproj_in")
        self.yproj_in = nn.Dense(self.zdim, name="yproj_in")
        self.encoder = SeqTransformer(
            self.zdim, self.zdim, nhead=self.nhead, num_layers=self.num_layers,
            conv1d=True, out_last=False, pos_embd=self.pos_embd,
            pos_learnable=self.pos_learnable, max_len=self.max_len,
            name="encoder")
        self.dec_x = nn.Dense(self.xdim, name="dec_x")
        self.dec_y = nn.Dense(self.ydim, name="dec_y")

    def _branch(self, proj_fn, dec_fn, data, lengths, deterministic,
                critic, mask_encoder: bool):
        if data.ndim == 2:
            data = data[:, None, :]
        proj = proj_fn(data)
        # parity quirk: the reference key-padding-masks the encoder for x
        # (models.py:201) but NOT for y (models.py:233 'self.encoder(y_proj)');
        # y lengths only mask the loss
        z = self.encoder(proj, lengths=lengths if mask_encoder else None,
                         deterministic=deterministic)
        recon = dec_fn(z)
        mask = (length_mask(lengths, data.shape[1])
                if lengths is not None else None)
        if recon.shape[1] == 1:
            loss = masked_mse(recon[:, 0, :], data[:, 0, :])
        else:
            loss = critic(recon[:, :-1, :], data[:, 1:, :],
                          mask[:, 1:] if mask is not None else None)
        diff_next = jnp.mean((proj - z) ** 2)
        return loss, proj, z, recon, diff_next

    def __call__(self, x=None, y=None, x_lengths=None, y_lengths=None,
                 deterministic=True):
        out = {"loss_x": jnp.float32(0.0), "loss_y": jnp.float32(0.0),
               "loss_private": jnp.float32(0.0)}
        if x is not None:
            (out["loss_x"], out["x_proj"], out["zx"], out["x_recon"],
             out["diff_next_x"]) = self._branch(
                self.xproj_in, self.dec_x, x, x_lengths, deterministic,
                masked_mse, mask_encoder=True)
        if y is not None:
            y_critic = sequence_info_nce if self.info_nce else masked_mse
            (out["loss_y"], out["y_proj"], out["zy"], out["y_recon"],
             out["diff_next_y"]) = self._branch(
                self.yproj_in, self.dec_y, y, y_lengths, deterministic,
                y_critic, mask_encoder=False)
        if x is not None and y is not None:
            x_private = out["x_proj"] - out["zx"]
            y_private = out["y_proj"] - out["zy"]
            out["x_private"], out["y_private"] = x_private, y_private
            # models.py:258-262: sum over batch of squared mean
            # cross-correlation of residuals
            out["loss_private"] = jnp.sum(
                jnp.mean(x_private * y_private, axis=(1, 2)) ** 2)
        return out

    def get_embedding(self, x, y):
        """Mean-pooled shared-encoder latents (models.py:273-278)."""
        if x.ndim == 2:
            x = x[:, None, :]
        if y.ndim == 2:
            y = y[:, None, :]
        zx = self.encoder(self.xproj_in(x))
        zy = self.encoder(self.yproj_in(y))
        return zx.mean(axis=1), zy.mean(axis=1)


def make_seq_uml(xdim, ydim, zdim, pos_embd=False, pos_learnable=False,
                 info_nce=False) -> SeqUML:
    """Assemble the reference main.py:117-121 architecture."""
    return SeqUML(xdim=xdim, ydim=ydim, zdim=zdim, nhead=5, num_layers=5,
                  pos_embd=pos_embd, pos_learnable=pos_learnable,
                  max_len=128, info_nce=info_nce)
