from uml_tpu.train.optim import HYPER_DICT, build_optimizer, build_schedule
from uml_tpu.train.supervised import CyclicBatcher, eval_batches, train
from uml_tpu.train.gaussian import train_gaussian
from uml_tpu.train.selfsup import SelfSupTrainer, evaluate, train_selfsup
from uml_tpu.train.probes import probe_scores, device_probe_scores

__all__ = [
    "HYPER_DICT",
    "build_optimizer",
    "build_schedule",
    "CyclicBatcher",
    "eval_batches",
    "train",
    "train_gaussian",
    "SelfSupTrainer",
    "evaluate",
    "train_selfsup",
    "probe_scores",
    "device_probe_scores",
]
