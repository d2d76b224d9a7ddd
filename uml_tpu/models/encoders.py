"""Encoder providers: pretrained-weight resolution + jitted encode loops.

The reference downloads CLIP weights by URL at first use (engine/clip/
clip.py:39-68).  This build resolves weights from local paths (zero-egress):

  $UML_CLIP_WEIGHTS_DIR/<name with / -> ->.pt     e.g. ViT-B-16.pt

Missing weights raise a clear error unless ``allow_random_init`` (testing).
Encode loops pad the final batch to a fixed shape so jit compiles once.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from uml_tpu.models.clip import CLIP, build_clip
from uml_tpu.models.tokenizer import tokenize
from uml_tpu.ops import normalize_images


# Official OpenAI checkpoint SHA256 digests (the reference embeds these
# in its download URLs and verifies after fetch, engine/clip/clip.py:
# 29-39,50,65 — zero-egress here, so the integrity check moves to load
# time over the local file)
CLIP_SHA256 = {
    "RN50": "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101": "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4": "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "RN50x16": "52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa",
    "ViT-B/32": "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
    "ViT-B/16": "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
}


def verify_clip_sha256(name: str, path: str) -> None:
    """Raise if the local checkpoint's SHA256 mismatches the official
    digest (reference clip.py:65 raises the same way after download).
    Unknown names pass (no digest to check); UML_CLIP_VERIFY_SHA=0
    skips (e.g. deliberately patched checkpoints)."""
    if os.environ.get("UML_CLIP_VERIFY_SHA", "1") == "0":
        return
    want = CLIP_SHA256.get(name)
    if want is None:
        return
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    if h.hexdigest() != want:
        raise RuntimeError(
            f"{path} SHA256 {h.hexdigest()} does not match the official "
            f"{name} checkpoint digest {want}; set UML_CLIP_VERIFY_SHA=0 "
            "to load it anyway")


def clip_weights_path(name: str) -> str | None:
    root = os.environ.get("UML_CLIP_WEIGHTS_DIR", "")
    if not root:
        return None
    path = os.path.join(root, name.replace("/", "-") + ".pt")
    return path if os.path.exists(path) else None


def load_clip(name: str, dtype=jnp.bfloat16, allow_random_init: bool = False,
              quant: str = "none"):
    """-> (model: CLIP, variables). Ports torch weights when available.

    ``quant='int8'``: W8A8 serving mode for the ViT/text transformers
    (ops.quant) — ~2x MXU rate on v5e, per-row dynamic activation scales,
    no calibration pass.  RN towers ignore it."""
    path = clip_weights_path(name)
    if path is not None:
        from uml_tpu.models.port_torch import load_clip_checkpoint

        verify_clip_sha256(name, path)
        print(f"=> Loading CLIP weights from {path}")
        return load_clip_checkpoint(path, dtype=dtype, quant=quant)
    if not allow_random_init:
        raise FileNotFoundError(
            f"No CLIP weights for {name!r}. Set UML_CLIP_WEIGHTS_DIR to a "
            "directory containing the OpenAI checkpoint "
            f"({name.replace('/', '-')}.pt), or pass --allow-random-init "
            "for smoke testing."
        )
    print(f"=> [random-init] CLIP {name} (no pretrained weights found)")
    model = build_clip(name, dtype=dtype, quant=quant)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, model.config.image_resolution,
                   model.config.image_resolution, 3), jnp.float32),
        jnp.zeros((1, model.config.context_length), jnp.int32),
    )
    return model, variables


class ClipEncoder:
    """Jitted image/text encoding over a CLIP model (frozen weights).

    ``mesh``: optional jax.sharding.Mesh — image/text batches are sharded
    over the 'data' axis and the forward runs data-parallel (the reference
    is single-GPU, finetune.py:465; here extraction scales over ICI).
    """

    def __init__(self, name: str, dtype=jnp.bfloat16,
                 allow_random_init: bool = False, mesh=None,
                 quant: str = "none"):
        self.name = name
        self.model, self.variables = load_clip(name, dtype, allow_random_init,
                                               quant=quant)
        self.embed_dim = self.model.config.embed_dim
        self._dtype = dtype
        self.mesh = mesh
        from uml_tpu.core.meshes import replicate, staged_put

        if mesh is not None:
            self.variables = replicate(mesh, self.variables)
        else:
            # explicit synced staging: a ported weight tree left as host
            # numpy would transfer lazily at the first dispatch, riding
            # the relay's slow deferred path and stalling the first
            # batches' input transfers behind it (staged_put docstring)
            self.variables = staged_put(self.variables)

        model = self.model

        @jax.jit
        def _enc_img(v, u8):
            # normalization folded into the patch embedding (ops.patch_embed)
            return model.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))

        @jax.jit
        def _enc_img_tokens(v, u8):
            return model.apply(
                v, u8,
                method=lambda m, x: m.encode_image_u8(x, return_tokens=True))

        @jax.jit
        def _enc_txt(v, toks):
            return model.apply(
                v, toks,
                method=lambda m, t: m.encode_text(t, return_eot=True))

        @jax.jit
        def _enc_txt_tokens(v, toks):
            return model.apply(
                v, toks,
                method=lambda m, t: m.encode_text(
                    t, return_eot=True, return_tokens=True))

        self._enc_img = _enc_img
        self._enc_img_tokens = _enc_img_tokens
        self._enc_txt = _enc_txt
        self._enc_txt_tokens = _enc_txt_tokens

    def encode_images_async(self, imgs_uint8: np.ndarray,
                            batch_pad: int | None = None,
                            return_tokens: bool = False):
        """Enqueue transfer + jitted forward WITHOUT fetching: returns
        (device_output, n_valid).  Callers keep a small window of pending
        outputs and fetch behind it, so batch k+1's host work (decode,
        transfer) overlaps batch k's device forward — the extraction hot
        loop's pipelining (reference features.py:225-248 blocks per batch).
        Fetch with np.asarray(out)[:n]."""
        batch, n = self.stage_images(imgs_uint8, batch_pad)
        return self.encode_staged(batch, n, return_tokens)

    def stage_images(self, imgs_uint8: np.ndarray,
                     batch_pad: int | None = None):
        """Pad + flatten + synced host->device transfer of one uint8
        batch WITHOUT dispatching the forward: returns (device_batch,
        n_valid).  Split out so a transfer thread can keep the H2D link
        busy while the main thread dispatches (encode_staged) — a decode
        or dispatch stall then never idles the link (cli/features.py's
        feeder-structured loop)."""
        n = imgs_uint8.shape[0]
        if batch_pad is not None and n < batch_pad:
            imgs_uint8 = np.concatenate(
                [imgs_uint8,
                 np.zeros((batch_pad - n, *imgs_uint8.shape[1:]), np.uint8)])
        from uml_tpu.core.meshes import maybe_shard_batch

        # transfer flat: [B, H, W, 3] uint8 pads the 3-lane dim 42x on TPU
        flat = imgs_uint8.reshape(imgs_uint8.shape[0], -1)
        batch = maybe_shard_batch(self.mesh, jnp.asarray(flat))
        # sync the transfer before dispatch: an unsynced transfer through
        # the axon relay falls into a ~10x slower use-triggered send path
        # (tools/exp_pipeline_compose.py); prior batches' forwards are
        # already enqueued, so the device stays busy during the sync
        jax.block_until_ready(batch)
        return batch, n

    def encode_staged(self, batch, n: int, return_tokens: bool = False):
        """Dispatch the jitted forward on an already-staged device batch
        (see stage_images): returns (device_output, n_valid), unfetched."""
        fn = self._enc_img_tokens if return_tokens else self._enc_img
        return fn(self.variables, batch), n

    def encode_images(self, imgs_uint8: np.ndarray, batch_pad: int | None = None,
                      return_tokens: bool = False) -> np.ndarray:
        """uint8 [B,H,W,3] -> features [B,D] (or [B,S,W] tokens)."""
        out, n = self.encode_images_async(imgs_uint8, batch_pad, return_tokens)
        return np.asarray(out, dtype=np.float32)[:n]

    def encode_texts(self, texts: list[str], return_tokens: bool = False):
        """list[str] -> (features [N,D] | tokens [N,77,W], eot_indices [N])."""
        toks = tokenize(texts)
        fn = self._enc_txt_tokens if return_tokens else self._enc_txt
        from uml_tpu.core.meshes import maybe_shard_batch

        toks = maybe_shard_batch(self.mesh, jnp.asarray(toks))
        out, eot = fn(self.variables, toks)
        return (np.asarray(out, np.float32),
                np.asarray(eot, np.int64))
