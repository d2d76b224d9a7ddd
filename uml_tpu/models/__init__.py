from uml_tpu.models.clip import CLIP, ClipResNetModel, build_clip, clip_embed_dim
from uml_tpu.models.dino import DinoViT, load_dino
from uml_tpu.models.tokenizer import ClipTokenizer, tokenize
from uml_tpu.models.uml_head import UMLHead, make_uml_clip_head, make_uml_dino_head
from uml_tpu.models.seq_autoencoder import SeqUML, SeqTransformer, make_seq_uml
from uml_tpu.models.shared_autoencoder import SharedAutoencoder
from uml_tpu.models.languagemodel import TextModel

__all__ = [
    "CLIP",
    "ClipResNetModel",
    "build_clip",
    "clip_embed_dim",
    "DinoViT",
    "load_dino",
    "ClipTokenizer",
    "tokenize",
    "UMLHead",
    "make_uml_clip_head",
    "make_uml_dino_head",
    "SeqUML",
    "SeqTransformer",
    "make_seq_uml",
    "SharedAutoencoder",
    "TextModel",
]
