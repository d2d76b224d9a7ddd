"""UML heads: shared linear classifier over image features + text features.

Capability parity with engine/models/head.py:
  * ``UML``  (head.py:39-98): vision backbone + optional ``img_proj`` Linear
    to the text dim (when text_indim>0), shared Linear ``head`` (no bias by
    default), per-modality learnable scales, freeze_backbone support.
  * ``UMLClip`` (head.py:101-141): CLIP image tower + shared head, fixed
    ``logit_scale`` = log(1/0.07) by default, logits scaled by exp(scale).
  * zero-shot init (head.py:7-37, 96-98): head weight rows = L2-normalized
    class-averaged text features.

TPU-first design: the model is a *functional* wrapper — trainable params
are an explicit pytree, the (possibly frozen) backbone is a closure.  The
train step differentiates exactly the trainable tree; a frozen backbone's
params never enter autodiff (vs the reference's requires_grad_(False)
bookkeeping).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


class UMLHead:
    """Functional UML model.

    forward(trainable, image_features_or_images, text_features)
      -> (img_logits, txt_logits)

    ``backbone`` maps (backbone_params, images) -> features; when
    ``freeze_backbone`` the backbone params stay out of the trainable tree.
    When training from *precomputed features*, pass ``backbone=None`` and
    feed features directly.
    """

    def __init__(
        self,
        feat_dim: int,
        num_classes: int,
        *,
        text_indim: int = 0,
        bias: bool = False,
        learnable_temp: bool = False,
        logit_scale: float | None = None,   # set => UMLClip semantics
        backbone: Callable[[Any, jax.Array], jax.Array] | None = None,
        backbone_params: Any = None,
        freeze_backbone: bool = True,
        backbone_train: Callable | None = None,   # -> (feats, bn_updates)
    ):
        assert not bias, "reference always uses bias=False heads (head.py:68)"
        self.feat_dim = feat_dim
        self.num_classes = num_classes
        self.text_indim = text_indim
        self.shared_dim = text_indim if text_indim > 0 else feat_dim
        self.learnable_temp = learnable_temp
        self.logit_scale = logit_scale
        self.backbone = backbone
        self.backbone_params = backbone_params
        self.freeze_backbone = freeze_backbone
        self.backbone_train = backbone_train

    # -- params -----------------------------------------------------------

    def init_params(self, seed: int = 0) -> dict:
        """Trainable tree; torch-Linear-like uniform init (±1/sqrt(fan_in))."""
        key_head, key_proj = jax.random.split(jax.random.key(seed))
        params: dict = {
            "head_w": jax.random.uniform(
                key_head, (self.shared_dim, self.num_classes), jnp.float32,
                -1.0 / np.sqrt(self.shared_dim), 1.0 / np.sqrt(self.shared_dim)),
        }
        if self.text_indim > 0:
            params["img_proj_w"] = jax.random.uniform(
                key_proj, (self.feat_dim, self.text_indim), jnp.float32,
                -1.0 / np.sqrt(self.feat_dim), 1.0 / np.sqrt(self.feat_dim))
        if self.learnable_temp:
            params["img_scale"] = jnp.float32(1.0)
            params["txt_scale"] = jnp.float32(1.0)
        if self.backbone is not None and not self.freeze_backbone:
            params["backbone"] = self.backbone_params
        return params

    def zero_shot_init(self, params: dict, text_features, text_labels) -> dict:
        """head_w <- normalized class-mean text features (head.py:22-37)."""
        feats = np.asarray(text_features, np.float32)
        labels = np.asarray(text_labels)
        weights = np.zeros((self.num_classes, self.shared_dim), np.float32)
        for label in np.unique(labels):
            weights[int(label)] = feats[labels == label].mean(axis=0)
        weights /= np.linalg.norm(weights, axis=1, keepdims=True) + 1e-12
        params = dict(params)
        params["head_w"] = jnp.asarray(weights.T)  # [D, C]
        return params

    # -- forward ----------------------------------------------------------

    def _scales(self, params):
        if self.logit_scale is not None:  # UMLClip: fixed exp(logit_scale)
            s = jnp.exp(jnp.float32(self.logit_scale))
            return s, s
        if self.learnable_temp:
            return params["img_scale"], params["txt_scale"]
        return jnp.float32(1.0), jnp.float32(1.0)

    @staticmethod
    def _is_images(x) -> bool:
        """Backbone inputs are 4D pixel batches or (any-rank) uint8 —
        raw streams transfer FLAT [B, H*W*3] uint8 (a 4D uint8 layout
        pads the 3-wide lane dim on TPU); precomputed features are 2D
        floats."""
        return x.ndim == 4 or x.dtype == jnp.uint8

    def image_features(self, params: dict, images_or_feats) -> jax.Array:
        """Backbone forward (+ img_proj) -> shared-space features."""
        x = images_or_feats
        if self.backbone is not None and self._is_images(x):
            bparams = (
                params["backbone"] if not self.freeze_backbone
                else self.backbone_params
            )
            if self.freeze_backbone:
                x = jax.lax.stop_gradient(self.backbone(bparams, x))
            else:
                x = self.backbone(bparams, x)
        x = x.astype(jnp.float32)
        if self.text_indim > 0:
            x = x @ params["img_proj_w"]
        return x

    def image_features_train(self, params: dict, images):
        """Training-mode backbone forward -> (features, bn_updates|None).

        torch semantics for BatchNorm towers (RN50/101 full finetune,
        finetune.py:337-346 under model.train()): batch statistics
        normalize, and the momentum-updated running stats come back for
        the train step to merge after the optimizer update
        (``merge_bn_updates``).  No-op difference for BN-free towers.
        """
        if (self.backbone_train is None or self.freeze_backbone
                or self.backbone is None or not self._is_images(images)):
            return self.image_features(params, images), None
        x, upd = self.backbone_train(params["backbone"], images)
        x = x.astype(jnp.float32)
        if self.text_indim > 0:
            x = x @ params["img_proj_w"]
        return x, upd

    def merge_bn_updates(self, params: dict, bn_updates) -> dict:
        """Overwrite the backbone's running-stat leaves with the sown
        "bn_updates" (param layout unchanged; gradients never touch the
        stats, and any optimizer weight decay on them is overwritten)."""
        if bn_updates is None:
            return params
        upd = bn_updates.get("bn_updates", bn_updates)

        def merge(ptree, utree):
            out = dict(ptree)
            for key, val in utree.items():
                out[key] = (merge(ptree[key], val)
                            if isinstance(val, dict) else val)
            return out

        params = dict(params)
        backbone = dict(params["backbone"])
        backbone["params"] = merge(backbone["params"], upd)
        params["backbone"] = backbone
        return params

    def forward(self, params: dict, images_or_feats, text_features=None):
        img_scale, txt_scale = self._scales(params)
        feats = self.image_features(params, images_or_feats)
        img_logits = feats @ params["head_w"] * img_scale
        if text_features is None:
            return img_logits, None
        txt_logits = text_features.astype(jnp.float32) @ params["head_w"] * txt_scale
        return img_logits, txt_logits


def make_uml_clip_head(clip_model, clip_variables, num_classes,
                       logit_scale=float(np.log(1 / 0.07)),
                       learnable_temp=False, freeze_backbone=True) -> UMLHead:
    """UMLClip: CLIP image tower + shared head (head.py:101-141).

    The backbone accepts uint8 HWC batches (host loader output) and
    normalizes on device so the cast fuses into the patch embedding.
    """
    from uml_tpu.ops import normalize_images

    def backbone(variables, images):
        if images.dtype == jnp.uint8:
            # flat or 4D uint8: normalization folds into the patch embed
            # (ViT) or runs fused before the stem (RN)
            return clip_model.apply(
                variables, images, method=lambda m, x: m.encode_image_u8(x))
        return clip_model.apply(
            variables, images, method=lambda m, x: m.encode_image(x))

    backbone_train = None
    if hasattr(clip_model, "resnet_config") and not freeze_backbone:
        # RN50/101 full finetune: BatchNorm trains torch-style
        def backbone_train(variables, images):
            if images.dtype == jnp.uint8:
                if images.ndim == 2:
                    # square RGB; infer resolution from the flat dim
                    r = int(round((images.shape[1] // 3) ** 0.5))
                    images = images.reshape(images.shape[0], r, r, 3)
                images = normalize_images(images, clip_model.dtype)
            return clip_model.apply(
                variables, images, mutable=["bn_updates"],
                method=lambda m, x: m.encode_image(x, train_bn=True))

    return UMLHead(
        feat_dim=clip_model.config.embed_dim,
        num_classes=num_classes,
        text_indim=0,
        logit_scale=logit_scale,
        learnable_temp=learnable_temp,
        backbone=backbone,
        backbone_params=clip_variables,
        freeze_backbone=freeze_backbone,
        backbone_train=backbone_train,
    )


def make_uml_dino_head(dino_model, dino_variables, num_classes,
                       text_indim=0, learnable_temp=False,
                       freeze_backbone=True) -> UMLHead:
    """UML with a DINOv2/DINO backbone (head.py:39-98 semantics):
    optional img_proj into the text dim, shared head, learnable scales."""
    import jax.numpy as jnp

    def backbone(variables, images):
        if images.dtype == jnp.uint8:
            # flat or 4D uint8; normalization folded into the patch matmul
            return dino_model.apply(variables, images, from_uint8=True)
        return dino_model.apply(variables, images)

    return UMLHead(
        feat_dim=dino_model.config.num_features,
        num_classes=num_classes,
        text_indim=text_indim,
        learnable_temp=learnable_temp,
        backbone=backbone,
        backbone_params=dino_variables,
        freeze_backbone=freeze_backbone,
    )
