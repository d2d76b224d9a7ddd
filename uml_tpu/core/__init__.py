from uml_tpu.core.sweep import expand_sweep, run_sweep_cli, apply_combo
from uml_tpu.core.meshes import create_mesh, data_sharding, replicated_sharding
from uml_tpu.core.prng import make_rng, host_rng

__all__ = [
    "expand_sweep",
    "run_sweep_cli",
    "apply_combo",
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "make_rng",
    "host_rng",
]
