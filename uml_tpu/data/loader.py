"""Host-side image batch loader with threaded decode + prefetch.

The throughput half of the feature-extraction pipeline (the reference uses
torch DataLoader workers, features.py:152-161).  Here: a thread pool decodes
JPEGs to uint8 224x224x3 (PIL's C decode releases the GIL), batches are
assembled ahead of consumption with a bounded prefetch window, and
normalization happens on device (uml_tpu.ops.normalize_images) so each
batch crosses the host->device link as uint8.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from uml_tpu.data.transforms import load_uint8


class ImageBatchLoader:
    """Iterate item dicts ({'impath','label',...}) as uint8 batches.

    Yields (images_uint8 [B,H,W,3], labels int64 [B], paths list[str]).
    Deterministic order (no shuffle) like the reference's extraction loader;
    the final partial batch is yielded as-is (drop_last=False).
    """

    def __init__(self, items, augmentation="crop", batch_size=256,
                 num_workers=16, prefetch=4, seed=0, size=(224, 224),
                 fast_decode=True, start_batch=0):
        self.items = items
        self.augmentation = augmentation
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self.size = size
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
        rng = np.random.default_rng((self.seed, batch_idx))
        imgs = np.empty((len(batch_items), *self.size, 3), dtype=np.uint8)
        for i, item in enumerate(batch_items):
            if self._native is not None:
                try:
                    imgs[i] = self._native(item["impath"], self.size[0])
                    continue
                except RuntimeError:
                    pass  # non-JPEG or corrupt: PIL handles it below
            imgs[i] = load_uint8(item["impath"], self.augmentation,
                                 self.size, rng)
        labels = np.asarray([it["label"] for it in batch_items], dtype=np.int64)
        paths = [it["impath"] for it in batch_items]
        return imgs, labels, paths

    def __iter__(self):
        s0 = self.start_batch
        batches = [
            self.items[i : i + self.batch_size]
            for i in range(0, len(self.items), self.batch_size)
        ][s0:]
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            futures = []
            for idx, b in enumerate(batches[: self.prefetch]):
                futures.append(pool.submit(self._decode_batch, b, s0 + idx))
            for idx in range(len(batches)):
                if idx + self.prefetch < len(batches):
                    futures.append(pool.submit(
                        self._decode_batch, batches[idx + self.prefetch],
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
