"""Weight initializers matching the distributions the reference trains from.

The reference's trainable modules are stock ``torch.nn.Linear`` layers whose
default init is kaiming-uniform(a=sqrt(5)) for weights — i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for biases.  Matching the *distribution* (not the bit-sequence) keeps
optimization trajectories statistically comparable when reproducing the
paper's numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """flax Dense kernel is [in, out]; fan_in = shape[0]."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
