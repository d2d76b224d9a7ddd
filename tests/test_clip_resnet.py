"""ModifiedResNet CLIP tower tests: parity with the reference torch model,
checkpoint dispatch, encoder integration."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from uml_tpu.models.clip import build_clip, clip_embed_dim
from uml_tpu.models.clip_resnet import (
    CLIP_RESNET_CONFIGS,
    ClipResNetConfig,
    ModifiedResNet,
    port_clip_resnet_state_dict,
)

REFERENCE = "/root/reference/vision_language"


@pytest.fixture(scope="module")
def ref_rn_clip():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_clip_model_rn", f"{REFERENCE}/engine/clip/model.py")
    ref_model = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_model)
    torch.manual_seed(0)
    return ref_model.CLIP(
        embed_dim=64, image_resolution=64, vision_layers=(1, 1, 1, 1),
        vision_width=16, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_heads=1,
        transformer_layers=1).float().eval()


@pytest.mark.heavy
def test_rn_tower_parity(ref_rn_clip):
    torch = pytest.importorskip("torch")
    cfg = ClipResNetConfig(layers=(1, 1, 1, 1), output_dim=64, width=16,
                           image_resolution=64)
    variables = port_clip_resnet_state_dict(ref_rn_clip.state_dict(), cfg)
    model = ModifiedResNet(cfg, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = ref_rn_clip.visual(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


@pytest.mark.heavy
def test_rn_checkpoint_dispatch(ref_rn_clip, tmp_path):
    torch = pytest.importorskip("torch")
    from uml_tpu.models.clip import ClipResNetModel
    from uml_tpu.models.port_torch import load_clip_checkpoint
    from uml_tpu.models.tokenizer import tokenize

    path = tmp_path / "rn.pt"
    torch.save(ref_rn_clip.state_dict(), path)
    model, variables = load_clip_checkpoint(str(path))
    assert isinstance(model, ClipResNetModel)
    assert model.embed_dim == 64

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    toks = tokenize(["a photo of a cat.", "hello"])
    with torch.no_grad():
        e_img = ref_rn_clip.encode_image(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        e_txt = ref_rn_clip.encode_text(
            torch.from_numpy(toks.astype(np.int64))).numpy()
    g_img = model.apply(variables, jnp.asarray(x),
                        method=lambda m, p: m.encode_image(p))
    g_txt = model.apply(variables, jnp.asarray(toks),
                        method=lambda m, t: m.encode_text(t))
    np.testing.assert_allclose(np.asarray(g_img), e_img, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_txt), e_txt, atol=1e-4)


def test_build_clip_rn_names():
    m50 = build_clip("RN50")
    assert m50.resnet_config.layers == (3, 4, 6, 3)
    assert clip_embed_dim("RN50") == 1024
    m101 = build_clip("RN101")
    assert m101.resnet_config.layers == (3, 4, 23, 3)
    assert clip_embed_dim("RN101") == 512
    assert clip_embed_dim("ViT-B/16") == 512
    assert CLIP_RESNET_CONFIGS["RN50"].heads == 32
