"""Device mesh + sharding helpers.

The reference is single-GPU (finetune.py:465 hardcodes cuda:0); scale-out is
process-level sweeps. Here parallelism is first-class: every train step is
jitted over a ``jax.sharding.Mesh`` with a ``data`` axis (primary, batch
sharded over ICI) and an optional ``model`` axis (tensor parallel for the
large text encoders). XLA inserts the collectives (psum for grad
all-reduce) from the sharding annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``n_data=None`` uses every device on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def staged_put(tree, placement=None):
    """One-time weight staging: host-routed device_put + block_until_ready.

    Two relay (axon TPU tunnel) hazards, both measured in
    tools/exp_bench_poison.py / tools/exp_poison_bisect2.py:

    * an UNSYNCED bulk put defers the send onto a ~50x slower trickle
      path and every later H2D transfer queues behind it (19 MB probe:
      3.3 MB/s behind an unsynced weight-tree put, 1258 MB/s fresh);
      blocking right after the put keeps staging on the fast bulk path.
    * a DIRECT cross-backend put of a cpu-backend jit-output tree
      permanently wedges the fast path (~1400 -> ~35 MB/s for the rest
      of the process), plausibly via the CPU compiler's non-default
      array layouts; the same tree routed through host numpy stays fast.

    So: cpu-backend jax leaves are converted to host numpy first when
    the target is a different platform (a cheap host copy), then the
    whole tree is put and synced.  One-time cost at model build."""
    if placement is None:
        placement = jax.devices()[0]
    tgt = getattr(placement, "platform", None)
    if tgt is None:  # a Sharding
        tgt = next(iter(placement.device_set)).platform

    def host_route(x):
        if (tgt != "cpu" and isinstance(x, jax.Array)
                and all(d.platform == "cpu" for d in x.devices())):
            return np.asarray(x)
        return x

    tree = jax.tree.map(host_route, tree)
    return jax.block_until_ready(jax.tree.map(
        lambda x: jax.device_put(x, placement), tree))


def replicate(mesh: Mesh, tree):
    return staged_put(tree, replicated_sharding(mesh))


def maybe_shard_batch(mesh: Mesh | None, tree):
    """Shard each leaf's batch dim over 'data' when divisible, else
    replicate; identity when mesh is None.  Safe for ragged final batches
    and scalar aux inputs."""
    if mesh is None:
        return tree
    n = mesh.shape[DATA_AXIS]
    data = data_sharding(mesh)
    repl = replicated_sharding(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


def mesh_from_flag(mesh_flag: str = "auto") -> Mesh | None:
    """CLI entry: 'auto' -> data-parallel mesh over every device when more
    than one is present; 'off' -> None (single-device dispatch).

    Multi-host jobs: initializes the distributed runtime first (no-op for
    single-process runs), so the mesh spans every host's devices."""
    if mesh_flag == "off":
        return None
    from uml_tpu.core.distributed import maybe_initialize

    maybe_initialize()
    if len(jax.devices()) <= 1:
        return None
    return create_mesh()
