

def test_process_workers_match_thread_workers(tmp_path):
    """worker_kind='process' (spawn) yields bit-identical batches to the
    thread pool — decode is deterministic per (seed, batch index)."""
    import numpy as np
    from PIL import Image

    from uml_tpu.data.loader import ImageBatchLoader

    rng = np.random.default_rng(3)
    items = []
    for i in range(10):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(rng.integers(0, 256, (64, 64, 3),
                                     dtype=np.uint8)).save(p, quality=90)
        items.append({"impath": str(p), "label": i})

    kw = dict(augmentation="crop", batch_size=4, prefetch=2,
              seed=7, size=(32, 32))
    a = list(ImageBatchLoader(items, num_workers=2, **kw))
    b = list(ImageBatchLoader(items, num_workers=2, worker_kind="process",
                              **kw))
    assert len(a) == len(b) == 3
    for (ia, la, pa), (ib, lb, pb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
        assert pa == pb
