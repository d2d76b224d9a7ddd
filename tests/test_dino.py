"""DINOv2 flax port tests: parity with HF Dinov2Model, pos-emb interpolation."""

import numpy as np
import pytest
import jax.numpy as jnp

from uml_tpu.models.dino import (
    DINO_CONFIGS,
    DinoConfig,
    DinoViT,
    interpolate_pos_embeddings,
    port_dinov2_state_dict,
)


def test_config_table_matches_reference_choices():
    for name in ("vit_small_patch14_dinov2.lvd142m",
                 "vit_base_patch14_dinov2.lvd142m",
                 "vit_large_patch14_dinov2.lvd142m",
                 "vit_base_patch16_224_dino",
                 "vit_base_patch8_224_dino"):
        cfg, repo = DINO_CONFIGS[name]
        assert cfg.image_size == 224
    assert DINO_CONFIGS["vit_small_patch14_dinov2.lvd142m"][0].num_features == 384
    assert DINO_CONFIGS["vit_large_patch14_dinov2.lvd142m"][0].num_layers == 24
    assert not DINO_CONFIGS["vit_base_patch16_224_dino"][0].layerscale


@pytest.mark.heavy
def test_parity_with_hf_dinov2():
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    hf = Dinov2Model(Dinov2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, image_size=64, patch_size=16,
        layerscale_value=1.0)).eval()
    cfg = DinoConfig(64, 2, 4, 16, image_size=64, pretrain_image_size=64)
    variables = port_dinov2_state_dict(hf.state_dict(), cfg)
    model = DinoViT(cfg, dtype=jnp.float32)

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)).last_hidden_state.numpy()
    got = model.apply(variables, jnp.asarray(x), return_tokens=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    pooled = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(pooled), ref[:, 0], atol=1e-4)
    mean_pool = model.apply(variables, jnp.asarray(x), pool="mean")
    np.testing.assert_allclose(np.asarray(mean_pool), ref[:, 1:].mean(1), atol=1e-4)


def test_pos_embedding_interpolation():
    pos = np.random.default_rng(0).standard_normal((1, 1 + 16, 8)).astype(np.float32)
    out = interpolate_pos_embeddings(pos, 4, 7)
    assert out.shape == (1, 1 + 49, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # cls untouched
    same = interpolate_pos_embeddings(pos, 4, 4)
    np.testing.assert_array_equal(same, pos)


@pytest.mark.heavy
def test_from_uint8_matches_normalize_then_conv():
    """The uint8 fast path (normalization folded into the patch matmul,
    flat transfer layout) equals normalize -> conv within float tolerance."""
    import jax

    from uml_tpu.models.dino import DINO_CONFIGS, DinoViT
    from uml_tpu.ops import normalize_images

    cfg, _ = DINO_CONFIGS["vit_base_patch16_224_dino"]
    model = DinoViT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))

    want = model.apply(variables, normalize_images(jnp.asarray(u8),
                                                   jnp.float32))
    got = model.apply(variables, jnp.asarray(u8.reshape(2, -1)),
                      from_uint8=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
