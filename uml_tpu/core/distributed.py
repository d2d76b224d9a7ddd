"""Multi-host (multi-process) JAX runtime initialization.

The reference has no distributed runtime at all — scale-out is one Slurm
array task per hyperparameter combo (vision_language/finetune.py:541-550),
each process on a single `cuda:0`.  This framework keeps that sweep
contract (core.sweep) but additionally supports one *job* spanning many
TPU hosts: every process calls :func:`maybe_initialize` before first
device use, after which ``jax.devices()`` is the global device set, and
the (data, model) meshes built by ``core.meshes.create_mesh`` span hosts —
XLA routes collectives over ICI within a slice and DCN across slices.

Process topology is discovered from (first match wins):

1. Explicit env: ``UML_COORDINATOR`` (host:port), ``UML_NUM_PROCESSES``,
   ``UML_PROCESS_ID``.
2. Slurm multi-task env: ``SLURM_NTASKS`` > 1 with ``SLURM_PROCID`` /
   ``SLURM_STEP_NODELIST`` (the reference's own launcher environment,
   finetune.py:541).
3. TPU pod metadata: none of the above set — `jax.distributed.initialize`
   auto-discovers on Cloud TPU; we only call it when
   ``UML_AUTO_DISTRIBUTED=1`` to avoid breaking single-host runs.

Single-process runs are a no-op: call it unconditionally from every CLI.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_INITIALIZED = False


@dataclass(frozen=True)
class ProcessTopology:
    coordinator_address: str | None
    num_processes: int
    process_id: int


def _first_slurm_host(nodelist: str) -> str:
    """'host[3-17,21],other' -> 'host3' (minimal Slurm nodelist expansion:
    only the leading hostname is needed for the coordinator address)."""
    head = nodelist.split(",")[0]
    m = re.match(r"([^\[]+)\[([0-9]+)", head)
    if m:
        return m.group(1) + m.group(2)
    return head


def detect_topology(env: dict | None = None) -> ProcessTopology | None:
    """Inspect the environment for a multi-process topology.

    Returns None for single-process runs (the common case).
    """
    env = os.environ if env is None else env
    if "UML_COORDINATOR" in env:
        return ProcessTopology(
            coordinator_address=env["UML_COORDINATOR"],
            num_processes=int(env.get("UML_NUM_PROCESSES", "1")),
            process_id=int(env.get("UML_PROCESS_ID", "0")),
        )
    ntasks = int(env.get("SLURM_NTASKS", "1") or "1")
    if ntasks > 1 and "SLURM_PROCID" in env:
        nodelist = env.get("SLURM_STEP_NODELIST",
                           env.get("SLURM_NODELIST", ""))
        port = env.get("UML_COORDINATOR_PORT", "8476")
        coord = f"{_first_slurm_host(nodelist)}:{port}" if nodelist else None
        return ProcessTopology(
            coordinator_address=coord,
            num_processes=ntasks,
            process_id=int(env["SLURM_PROCID"]),
        )
    if env.get("UML_AUTO_DISTRIBUTED") == "1":
        # Cloud TPU pod: jax auto-discovers everything
        return ProcessTopology(coordinator_address=None,
                               num_processes=0, process_id=0)
    return None


def maybe_initialize(env: dict | None = None) -> bool:
    """Call ``jax.distributed.initialize`` when the environment describes a
    multi-process job.  Idempotent; no-op (returns False) otherwise.

    Must run before the first JAX device query in the process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    topo = detect_topology(env)
    if topo is None:
        return False
    import jax

    if topo.num_processes == 0:
        jax.distributed.initialize()          # TPU pod auto-discovery
    else:
        jax.distributed.initialize(
            coordinator_address=topo.coordinator_address,
            num_processes=topo.num_processes,
            process_id=topo.process_id,
        )
    _INITIALIZED = True
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def is_primary() -> bool:
    """True on the process that should write artifacts/logs (host 0)."""
    import jax

    return jax.process_index() == 0
