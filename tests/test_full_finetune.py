"""Full-backbone finetuning path: raw image stream + trainable CLIP tower."""

import numpy as np
import pytest
from PIL import Image

from uml_tpu.data.loader import RawImageStream
from uml_tpu.models.clip import CLIP, ClipConfig
from uml_tpu.models.uml_head import make_uml_clip_head
from uml_tpu.train.optim import build_optimizer, build_schedule
from uml_tpu.train.supervised import CyclicBatcher, eval_batches, train


def _image_items(tmp_path, n_classes=3, per_class=8, size=32):
    items = []
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        for i in range(per_class):
            # class-colored images: learnable signal
            arr = np.full((size, size, 3), 0, np.uint8)
            arr[..., c] = rng.integers(150, 255)
            p = tmp_path / f"c{c}_{i}.jpg"
            Image.fromarray(arr).save(p, quality=95)
            items.append({"impath": str(p), "label": c, "classname": str(c)})
    return items


def test_raw_stream_shapes_and_reshuffle(tmp_path):
    items = _image_items(tmp_path)
    stream = RawImageStream(items, "crop", batch_size=16, seed=0,
                            size=(32, 32))
    it = iter(stream)
    imgs, labels, weights = next(it)
    # flat uint8: the TPU transfer layout (loader.py RawImageStream)
    assert imgs.shape == (16, 32 * 32 * 3) and imgs.dtype == np.uint8
    # 24 items, bs 16 -> second batch padded 8 real + 8 zero-weight
    _, labels2, weights2 = next(it)
    assert weights2.sum() == 8
    # next epoch starts, different order than epoch 1's first batch
    imgs3, labels3, _ = next(it)
    assert weights.sum() == 16
    epoch1 = np.concatenate([labels, labels2[weights2 > 0]])
    assert sorted(epoch1.tolist()) == sorted(x["label"] for x in items)


@pytest.mark.heavy
def test_trainable_backbone_learns(tmp_path):
    import jax.numpy as jnp

    items = _image_items(tmp_path)
    cfg = ClipConfig(embed_dim=16, image_resolution=32, vision_layers=1,
                     vision_width=64, vision_patch_size=16,
                     transformer_width=64, transformer_heads=1,
                     transformer_layers=1)
    clip = CLIP(cfg, dtype=jnp.float32, attn_impl="reference")
    variables = clip.init(
        __import__("jax").random.key(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32), jnp.zeros((1, 77), jnp.int32))
    model = make_uml_clip_head(clip, variables, num_classes=3,
                               logit_scale=0.0, freeze_backbone=False)
    params = model.init_params(seed=0)
    assert "backbone" in params  # the tower is trainable

    stream = RawImageStream(items, "crop", batch_size=8, seed=0, size=(32, 32))
    # eval on decoded uint8 images (raw path validation)
    from uml_tpu.data.loader import ImageBatchLoader

    imgs, labels = [], []
    for im, lab, _ in ImageBatchLoader(items, "crop", 8, size=(32, 32)):
        imgs.append(im)
        labels.append(lab)
    val = eval_batches(np.concatenate(imgs), np.concatenate(labels), 8)

    opt = build_optimizer("adamw", build_schedule(1e-3, "cosine", 0, 60), 0.0)
    out = train(model, iter(stream), None, val, optimizer=opt, max_iters=60,
                eval_freq=20, patience=10, init_params=params)
    assert out["val_acc"] > 0.9  # color classes are trivially separable


@pytest.mark.heavy
def test_resnet_bn_training_full_finetune(tmp_path):
    """RN tower full finetune: BatchNorm trains torch-style — batch stats
    normalize during training and the running stats move with momentum
    (reference finetune.py:337-346 under model.train())."""
    import jax
    import jax.numpy as jnp

    from uml_tpu.models.clip import ClipConfig, ClipResNetModel
    from uml_tpu.models.clip_resnet import ClipResNetConfig

    items = _image_items(tmp_path)
    rn_cfg = ClipResNetConfig(layers=(1, 1, 1, 1), output_dim=16, width=8,
                              image_resolution=32)
    text_cfg = ClipConfig(embed_dim=16, image_resolution=32, vision_layers=0,
                          vision_width=8, vision_patch_size=0,
                          transformer_width=64, transformer_heads=1,
                          transformer_layers=1)
    model_rn = ClipResNetModel(rn_cfg, text_cfg, dtype=jnp.float32,
                               attn_impl="reference")
    variables = jax.jit(model_rn.init)(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))
    head = make_uml_clip_head(model_rn, variables, num_classes=3,
                              logit_scale=0.0, freeze_backbone=False)
    assert head.backbone_train is not None
    params = head.init_params(seed=0)

    def bn_stats(p):
        return (np.asarray(p["backbone"]["params"]["visual"]["bn1"]["mean"]),
                np.asarray(p["backbone"]["params"]["visual"]["bn1"]["var"]))

    mean0, var0 = bn_stats(params)
    np.testing.assert_array_equal(mean0, 0.0)  # fresh running stats

    from uml_tpu.data.loader import ImageBatchLoader

    imgs, labels = [], []
    for im, lab, _ in ImageBatchLoader(items, "crop", 8, size=(32, 32)):
        imgs.append(im)
        labels.append(lab)
    val = eval_batches(np.concatenate(imgs), np.concatenate(labels), 8)

    stream = RawImageStream(items, "crop", batch_size=8, seed=0, size=(32, 32))
    opt = build_optimizer("adamw", build_schedule(1e-3, "cosine", 0, 40), 0.0)
    out = train(head, iter(stream), None, val, optimizer=opt, max_iters=40,
                eval_freq=20, patience=10, init_params=params)
    mean1, var1 = bn_stats({"backbone": out["final_params"]["backbone"]})
    # running stats moved via the momentum merge (not gradients)
    assert not np.allclose(mean1, mean0)
    assert not np.allclose(var1, var0)
    assert np.isfinite(mean1).all() and (var1 > 0).all()
    assert out["val_acc"] > 0.6


def test_dino_full_finetune_learns(tmp_path):
    """Gradient step through a trainable DINO tower
    (make_uml_dino_head(freeze_backbone=False), cli/finetune.py raw path;
    reference analog finetune.py:337-346 with timm DINOv2)."""
    import jax
    import jax.numpy as jnp

    from uml_tpu.models.dino import DinoConfig, DinoViT
    from uml_tpu.models.uml_head import make_uml_dino_head

    items = _image_items(tmp_path)
    cfg = DinoConfig(hidden_size=32, num_layers=1, num_heads=2,
                     patch_size=16, image_size=32, layerscale=True,
                     pretrain_image_size=32)
    dino = DinoViT(cfg, dtype=jnp.float32)
    variables = jax.jit(dino.init)(jax.random.key(0),
                                   jnp.zeros((1, 32, 32, 3), jnp.float32))
    model = make_uml_dino_head(dino, variables, num_classes=3,
                               text_indim=0, freeze_backbone=False)
    params = model.init_params(seed=0)
    assert "backbone" in params  # the DINO tower is trainable

    from uml_tpu.data.loader import ImageBatchLoader

    imgs, labels = [], []
    for im, lab, _ in ImageBatchLoader(items, "crop", 8, size=(32, 32)):
        imgs.append(im)
        labels.append(lab)
    val = eval_batches(np.concatenate(imgs), np.concatenate(labels), 8)

    stream = RawImageStream(items, "crop", batch_size=8, seed=0, size=(32, 32))
    opt = build_optimizer("adamw", build_schedule(1e-3, "cosine", 0, 60), 0.0)
    before = jax.tree.map(np.array, params["backbone"])
    out = train(model, iter(stream), None, val, optimizer=opt, max_iters=60,
                eval_freq=20, patience=10, init_params=params)
    assert out["val_acc"] > 0.9
    # the tower's weights actually moved (gradients flowed through DINO)
    after = out["final_params"]["backbone"]
    moved = any(
        not np.allclose(a, np.asarray(b), atol=1e-7)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)))
    assert moved
