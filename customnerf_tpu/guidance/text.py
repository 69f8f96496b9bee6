"""CLIP text encoding for SD prompts.

Equivalent of the reference's tokenizer + text_encoder handles
(``nerf/sd.py:61-94``).  The transformer is ``FlaxCLIPTextModel`` built from
a locally-constructed config (SD 1.x → CLIP ViT-L/14 text: 768 wide, 12
layers; SD 2.x → OpenCLIP ViT-H: 1024 wide, 23 layers) — no hub access.

Tokenizer: a full CLIP BPE requires vocab.json/merges.txt on disk; when a
``tokenizer/`` dir exists under ``--sd_weights`` we load the real
``CLIPTokenizer``.  Otherwise a deterministic hash tokenizer stands in so the
entire pipeline runs (weights are random-init in that case anyway; exact
token ids only matter once real weights are supplied).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

MAX_LEN = 77
BOS, EOS = 49406, 49407
VOCAB = 49408


class HashTokenizer:
    """Deterministic stand-in tokenizer: word → stable hash bucket.

    Pads to 77 with EOS, BOS/EOS framing like CLIP.  Documented fallback for
    environments without tokenizer files; replace by pointing --sd_weights at
    a directory containing tokenizer/vocab.json + merges.txt.
    """

    model_max_length = MAX_LEN

    def __init__(self):
        self.added_tokens = {}       # modifier tokens like <new1>
        self.next_id = VOCAB

    def add_token(self, token: str) -> int:
        if token not in self.added_tokens:
            self.added_tokens[token] = self.next_id
            self.next_id += 1
        return self.added_tokens[token]

    def __call__(self, prompts: List[str], **_):
        ids = np.full((len(prompts), MAX_LEN), EOS, dtype=np.int32)
        for i, p in enumerate(prompts):
            toks = [BOS]
            for w in p.lower().split():
                if w in self.added_tokens:
                    toks.append(self.added_tokens[w])
                else:
                    h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                    toks.append(h % (BOS - 1) + 1)
                if len(toks) >= MAX_LEN - 1:
                    break
            toks.append(EOS)
            ids[i, : len(toks)] = toks
        return ids

    @property
    def vocab_size(self):
        return self.next_id


def _text_config(sd_version: str):
    from transformers import CLIPTextConfig

    if sd_version.startswith("2"):
        return CLIPTextConfig(
            vocab_size=VOCAB, hidden_size=1024, intermediate_size=4096,
            num_hidden_layers=23, num_attention_heads=16,
            max_position_embeddings=MAX_LEN, hidden_act="gelu",
            projection_dim=1024,
        )
    return CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=MAX_LEN, hidden_act="quick_gelu",
        projection_dim=768,
    )


class TextEncoder:
    def __init__(self, sd_version: str = "1.5", weights_dir: Optional[str] = None,
                 seed: int = 0):
        from transformers import FlaxCLIPTextModel

        self.sd_version = sd_version
        self.tokenizer = None
        if weights_dir:
            tok_dir = os.path.join(weights_dir, "tokenizer")
            if os.path.isdir(tok_dir):
                try:
                    # native pure-Python CLIP BPE (guidance/bpe.py; validated
                    # against transformers.CLIPTokenizer in tests/test_bpe.py)
                    from customnerf_tpu.guidance.bpe import ClipBPETokenizer
                    self.tokenizer = ClipBPETokenizer.from_dir(tok_dir)
                except Exception as e:
                    print(f"[WARN] tokenizer load failed ({e}); hash fallback.")
        if self.tokenizer is None:
            self.tokenizer = HashTokenizer()

        cfg = _text_config(sd_version)
        self.model = FlaxCLIPTextModel(cfg, seed=seed, _do_init=True)
        self.params = self.model.params
        self.hidden_size = cfg.hidden_size

    def tokenize(self, prompts: List[str]) -> np.ndarray:
        return np.asarray(self.tokenizer(prompts, max_length=MAX_LEN),
                          dtype=np.int32)

    def encode(self, prompts: List[str]) -> jnp.ndarray:
        """[n_prompts] → last_hidden_state [n, 77, hidden]."""
        ids = self.tokenize(prompts)
        out = self.model(input_ids=ids, params=self.params)
        return out.last_hidden_state

    def get_text_embeds(self, prompt: List[str], negative_prompt: List[str]):
        """[uncond; cond] stack, the layout SDS expects
        (reference sd.py:77-94)."""
        cond = self.encode(prompt)
        uncond = self.encode(negative_prompt)
        return jnp.concatenate([uncond, cond], axis=0)
