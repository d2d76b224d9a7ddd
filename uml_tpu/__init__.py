"""uml_tpu — TPU-native Unpaired Multimodal Learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`Unpaired-Multimodal-Learning` reference codebase (UML: a single shared
model alternately trained on batches from different modalities without
paired samples).

Subpackages
-----------
core      mesh/sharding setup, PRNG discipline, typed config + YAML sweeps,
          train state, checkpointing
ops       Pallas TPU kernels (flash attention, fused image normalize, ...)
parallel  device-mesh helpers and sharded train-step wrappers
models    CLIP ViT / text tower, DINOv2, HF-LM pooling wrappers, UML heads,
          sequence autoencoder (MultiBench), linear autoencoder (Gaussian)
data      vision benchmarks + few-shot machinery, templates/descriptors,
          affect/MIMIC sequence ingestion, synthetic Gaussian DGP,
          robustness noise suites, feature caches
train     jitted alternating-modality train/eval loops, probes, optimizers
metrics   representation-alignment metric suite (CKA, mutual-kNN, ...)
cli       flag-compatible entrypoints (features/finetune/generate_fewshot/
          multibench/gaussian) + YAML sweep runner
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("UML_NO_COMPILE_CACHE") != "1":
    # XLA compilation dominates wall-clock on remote-compile TPU relays
    # (measured: 202s -> 15s for the MultiBench train step on a warm cache);
    # enable the persistent cache for every entrypoint that imports uml_tpu.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("UML_COMPILE_CACHE_DIR",
                        _os.path.expanduser("~/.cache/uml_tpu_xla")),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
