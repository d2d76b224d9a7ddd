"""Host-side image batch loader with threaded/process decode + prefetch.

The throughput half of the feature-extraction pipeline (the reference uses
torch DataLoader workers, features.py:152-161).  Here: a worker pool decodes
JPEGs to uint8 224x224x3 (PIL's C decode releases the GIL), batches are
assembled ahead of consumption with a bounded prefetch window, and
normalization happens on device (uml_tpu.ops.normalize_images) so each
batch crosses the host->device link as uint8.

``worker_kind="process"`` decodes in spawned subprocesses instead of
threads (torch DataLoader num_workers parity): measured 2.1x the thread
pool's rate on this container (2734.5 vs 1298.6 img/s at 12 workers,
tools/exp_pipe_gil2.py) — the GIL serializes enough of the per-image
Python (numpy slicing, RNG, dict handling) to cap threads even though
the decoders release it.  Spawn, never fork: JAX is multithreaded and a
forked child can deadlock.  Default stays "thread" (no worker startup
cost, no pickling) — extraction-scale sweeps opt in, or set
``UML_DECODE_WORKERS=process`` for the CLIs.
"""

from __future__ import annotations

import multiprocessing
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from uml_tpu.data.transforms import load_uint8

_PROC_NATIVE = None  # per-worker-process decoder cache
# persistent spawn pools keyed by worker count (torch DataLoader
# persistent_workers parity): a spawned worker pays python startup +
# package imports (~10 s with jax in the chain), so per-__iter__ pools
# put that startup INSIDE the first consumer's measurement window —
# the pool is created once and reused across loader instances
# (ProcessPoolExecutor registers its own atexit join)
_PROC_POOLS = {}


def _proc_pool(n):
    pool = _PROC_POOLS.get(n)
    # a worker death (OOM, native-decoder segfault) permanently breaks a
    # ProcessPoolExecutor — every later submit raises BrokenProcessPool.
    # Detect the broken cached pool and rebuild so one bad image costs a
    # batch, not every later extraction for the process lifetime.
    if pool is not None and getattr(pool, "_broken", False):
        pool.shutdown(wait=False, cancel_futures=True)
        pool = None
        _PROC_POOLS.pop(n, None)
    if pool is None:
        pool = ProcessPoolExecutor(
            max_workers=n, mp_context=multiprocessing.get_context("spawn"))
        _PROC_POOLS[n] = pool
    return pool


def shutdown_proc_pools():
    """Tear down the persistent decode pools (tests / explicit cleanup)."""
    for pool in list(_PROC_POOLS.values()):
        pool.shutdown(wait=False, cancel_futures=True)
    _PROC_POOLS.clear()


def _decode_batch_items(batch_items, batch_idx, augmentation, size, seed,
                        use_native):
    """Decode one batch (module-level so process pools can pickle it)."""
    native_fn = None
    if use_native:
        global _PROC_NATIVE
        if _PROC_NATIVE is None:
            from uml_tpu import native

            _PROC_NATIVE = (native.fast_decode_jpeg
                            if native.native_available() else False)
        native_fn = _PROC_NATIVE or None
    rng = np.random.default_rng((seed, batch_idx))
    imgs = np.empty((len(batch_items), *size, 3), dtype=np.uint8)
    for i, item in enumerate(batch_items):
        if native_fn is not None:
            try:
                imgs[i] = native_fn(item["impath"], size[0])
                continue
            except RuntimeError:
                pass  # non-JPEG or corrupt: PIL handles it below
        imgs[i] = load_uint8(item["impath"], augmentation, size, rng)
    labels = np.asarray([it["label"] for it in batch_items], dtype=np.int64)
    paths = [it["impath"] for it in batch_items]
    return imgs, labels, paths


class ImageBatchLoader:
    """Iterate item dicts ({'impath','label',...}) as uint8 batches.

    Yields (images_uint8 [B,H,W,3], labels int64 [B], paths list[str]).
    Deterministic order (no shuffle) like the reference's extraction loader;
    the final partial batch is yielded as-is (drop_last=False).
    """

    def __init__(self, items, augmentation="crop", batch_size=256,
                 num_workers=16, prefetch=4, seed=0, size=(224, 224),
                 fast_decode=True, start_batch=0, worker_kind="thread"):
        self.items = items
        self.augmentation = augmentation
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.size = size
        self.fast_decode = fast_decode
        if worker_kind not in ("thread", "process"):
            raise ValueError(f"worker_kind {worker_kind!r}: thread/process")
        self.worker_kind = worker_kind
        # resume support: begin at this batch index (augmentation RNG is
        # seeded per (seed, absolute batch index), so skipped batches cost
        # nothing and later batches are bit-identical to a full replay)
        self.start_batch = start_batch
        # native libjpeg IDCT-scaled decode (uml_tpu.native): ~2.3x PIL on
        # one core; only valid for the deterministic center-crop pipeline
        # and square targets; per-image PIL fallback covers non-JPEGs
        self._native = None
        if fast_decode and augmentation == "crop" and size[0] == size[1]:
            from uml_tpu import native

            if native.native_available():
                self._native = native.fast_decode_jpeg

    def __len__(self):
        return (len(self.items) + self.batch_size - 1) // self.batch_size

    def _decode_batch(self, batch_items, batch_idx):
        return _decode_batch_items(batch_items, batch_idx,
                                   self.augmentation, self.size, self.seed,
                                   self._native is not None)

    def __iter__(self):
        s0 = self.start_batch
        batches = [
            self.items[i : i + self.batch_size]
            for i in range(0, len(self.items), self.batch_size)
        ][s0:]
        if self.worker_kind == "process":
            pool = _proc_pool(self.num_workers)  # persistent, never closed

            def submit(b, idx):
                # same native-decode gate as __init__; each worker
                # process probes library availability itself
                return pool.submit(_decode_batch_items, b, idx,
                                   self.augmentation, self.size, self.seed,
                                   self.fast_decode
                                   and self.augmentation == "crop"
                                   and self.size[0] == self.size[1])

            yield from self._pump(batches, s0, submit)
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            yield from self._pump(
                batches, s0,
                lambda b, idx: pool.submit(self._decode_batch, b, idx))

    def _pump(self, batches, s0, submit):
        futures = []
        for idx, b in enumerate(batches[: self.prefetch]):
            futures.append(submit(b, s0 + idx))
        for idx in range(len(batches)):
            if idx + self.prefetch < len(batches):
                futures.append(submit(batches[idx + self.prefetch],
                                      s0 + idx + self.prefetch))
            yield futures[idx].result()


class RawImageStream:
    """Infinite shuffled raw-image batches for full backbone finetuning.

    Each epoch reshuffles the items and re-decodes with fresh augmentation
    draws (DataLoader(shuffle=True) parity, finetune.py:370); partial final
    batches are padded to batch_size with zero sample-weights so the jitted
    step keeps one shape.  Yields (uint8 FLAT [B, H*W*3], labels int64,
    weights) — the flat layout avoids the TPU's 3-wide-lane-dim padding on
    the host->device transfer; consumers reshape inside jit where the
    repack fuses into the patch extraction.
    """

    def __init__(self, items, augmentation, batch_size, seed=0,
                 num_workers=8, size=(224, 224)):
        self.items = list(items)
        self.augmentation = augmentation
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.size = size

    def __iter__(self):
        return self._iterate(0)

    def skip(self, n_batches: int):
        """Resume fast-forward: an iterator aligned with batch ``n_batches``
        without decoding the skipped images.  Cost is one permutation draw
        per skipped epoch (keeps the shuffle RNG stream identical to a
        replay); subsequent batches are bit-identical."""
        return self._iterate(n_batches)

    def _iterate(self, skip_batches: int):
        epoch = 0
        bpe = (len(self.items) + self.batch_size - 1) // self.batch_size
        while skip_batches >= bpe:
            self.rng.permutation(len(self.items))
            epoch += 1
            skip_batches -= bpe
        while True:
            order = self.rng.permutation(len(self.items))
            shuffled = [self.items[i] for i in order]
            loader = ImageBatchLoader(
                shuffled, self.augmentation, self.batch_size,
                num_workers=self.num_workers, seed=epoch, size=self.size,
                fast_decode=self.augmentation == "crop",
                start_batch=skip_batches)
            skip_batches = 0
            for imgs, labels, _ in loader:
                n = len(labels)
                imgs = imgs.reshape(n, -1)
                weights = np.ones(self.batch_size, np.float32)
                if n < self.batch_size:
                    pad = self.batch_size - n
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, imgs.shape[1]), np.uint8)])
                    labels = np.concatenate([labels, np.zeros(pad, np.int64)])
                    weights[n:] = 0.0
                yield imgs, labels, weights
            epoch += 1
