"""Data-parallel train-step wrapping.

The primary scale-out for UML workloads (SURVEY §2.4): batch sharded over
the mesh 'data' axis, params/optimizer state replicated, XLA inserting the
gradient psum from the sharding annotations — no hand-written collectives.

Usage:
    mesh = create_mesh(n_data=8)
    step = make_dp_train_step(train_step, mesh)   # same signature as
    params, opt, loss = step(params, opt, batch)  # the unsharded step
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uml_tpu.core.meshes import DATA_AXIS


def dp_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for this mesh."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS))


def make_dp_train_step(step_fn: Callable, mesh: Mesh,
                       donate_state: bool = True) -> Callable:
    """jit ``step_fn(params, opt_state, *batch) -> (params, opt_state, aux)``
    with params/opt replicated and every batch leaf sharded on 'data'.

    The returned callable accepts host numpy or device arrays; outputs keep
    the same shardings so the state never leaves the device between steps.
    """
    repl, data = dp_shardings(mesh)

    def place(tree, sharding):
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    jitted = jax.jit(
        step_fn,
        donate_argnums=(0, 1) if donate_state else (),
    )

    def wrapped(params, opt_state, *batch):
        params = place(params, repl)
        opt_state = place(opt_state, repl)
        batch = tuple(place(b, data) for b in batch)
        with mesh:
            return jitted(params, opt_state, *batch)

    return wrapped
