from uml_tpu.parallel.data_parallel import make_dp_train_step, dp_shardings
from uml_tpu.parallel.tensor_parallel import (
    transformer_tp_rules,
    apply_tp_sharding,
    infer_sharding_tree,
)

__all__ = [
    "make_dp_train_step",
    "dp_shardings",
    "transformer_tp_rules",
    "apply_tp_sharding",
    "infer_sharding_tree",
]
