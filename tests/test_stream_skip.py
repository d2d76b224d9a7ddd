"""Resume fast-forward: stream.skip(n) must equal n x next() exactly.

The supervised trainer realigns its data streams after an orbax restore
(train/supervised.py); skip() does it without gathering/decoding the
skipped batches, and the batches AFTER the skip point must be
bit-identical to a full replay (same shuffle RNG stream, same per-batch
augmentation seeds).
"""

import numpy as np
import pytest

from uml_tpu.data.loader import RawImageStream
from uml_tpu.train.supervised import CyclicBatcher


def _drain(it, n):
    return [next(it) for _ in range(n)]


@pytest.mark.parametrize("n_skip", [0, 1, 3, 7, 11])
def test_cyclic_batcher_skip_matches_replay(n_skip):
    n, bs = 10, 4  # 3 batches/epoch -> skips cross epoch boundaries
    x = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
    y = np.arange(n, dtype=np.int64)

    replay = _drain(iter(CyclicBatcher(x, y, bs, seed=7)), n_skip + 4)[n_skip:]
    skipped = _drain(CyclicBatcher(x, y, bs, seed=7).skip(n_skip), 4)
    for (xa, ya, wa), (xb, yb, wb) in zip(replay, skipped):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(wa, wb)


@pytest.mark.parametrize("n_skip", [0, 2, 5])
def test_raw_image_stream_skip_matches_replay(tmp_path, n_skip):
    from PIL import Image

    rng = np.random.default_rng(0)
    items = []
    for i in range(10):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(
            rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)).save(
                p, quality=95)
        items.append({"impath": str(p), "label": i % 3})

    def mk():
        return RawImageStream(items, "randomcrop", batch_size=4, seed=3,
                              num_workers=2, size=(32, 32))

    replay = _drain(iter(mk()), n_skip + 3)[n_skip:]
    skipped = _drain(mk().skip(n_skip), 3)
    for (xa, ya, wa), (xb, yb, wb) in zip(replay, skipped):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(wa, wb)
