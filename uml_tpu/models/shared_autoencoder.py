"""Shared linear autoencoder for the Gaussian UML experiment.

Capability parity with Gaussian_experiment/model.py:5-59: per-modality
input/output Linear heads around a *shared* MLP encoder
(Linear-ReLU-Linear) and decoder (Linear-ReLU-Linear); MSE reconstruction
loss per modality.  The shared encoder/decoder is what lets unpaired Y data
shape the representation X uses.

Written as a flax.linen module; both modalities are processed in one jitted
apply so XLA fuses the (tiny) matmuls and the whole train step is one
program.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from uml_tpu.models.initializers import torch_linear_weight, torch_linear_bias_for


def _dense(features: int, fan_in: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_weight,
        bias_init=torch_linear_bias_for(fan_in),
        name=name,
    )


class SharedAutoencoder(nn.Module):
    dim_obs: int
    dim_common: int
    dim_latent: int

    def setup(self):
        self.in_head_x = _dense(self.dim_common, self.dim_obs, "in_head_x")
        self.in_head_y = _dense(self.dim_common, self.dim_obs, "in_head_y")
        self.enc1 = _dense(self.dim_latent, self.dim_common, "enc1")
        self.enc2 = _dense(self.dim_latent, self.dim_latent, "enc2")
        self.dec1 = _dense(self.dim_latent, self.dim_latent, "dec1")
        self.dec2 = _dense(self.dim_common, self.dim_latent, "dec2")
        self.out_head_x = _dense(self.dim_obs, self.dim_common, "out_head_x")
        self.out_head_y = _dense(self.dim_obs, self.dim_common, "out_head_y")

    def encode(self, z):
        return self.enc2(nn.relu(self.enc1(z)))

    def decode(self, latent):
        return self.dec2(nn.relu(self.dec1(latent)))

    def __call__(self, x=None, y=None):
        """Returns (loss_x, loss_y, recon_x, recon_y) like model.py:29-49."""
        loss_x = jnp.float32(0.0)
        loss_y = jnp.float32(0.0)
        recon_x = recon_y = None
        if x is not None:
            recon_x = self.out_head_x(self.decode(self.encode(self.in_head_x(x))))
            loss_x = jnp.mean((recon_x - x) ** 2)
        if y is not None:
            recon_y = self.out_head_y(self.decode(self.encode(self.in_head_y(y))))
            loss_y = jnp.mean((recon_y - y) ** 2)
        return loss_x, loss_y, recon_x, recon_y

    def get_embeddings(self, x=None, y=None):
        """Shared-encoder latents per modality (model.py:51-59)."""
        emb_x = self.encode(self.in_head_x(x)) if x is not None else None
        emb_y = self.encode(self.in_head_y(y)) if y is not None else None
        return emb_x, emb_y
