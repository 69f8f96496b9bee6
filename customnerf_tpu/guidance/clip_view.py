"""CLIP view-direction matching for per-view prompt selection.

Equivalent of the reference's CLIP wrapper (``nerf/clip.py``) + the
clip_view machinery (``nerf/utils_init_nerf.py:254-258, 341-351``): embed
the frozen-model render and three canonical view texts
("front/side/back face of an object"), softmax the logits, and pick the
argmax view's SDS prompt.

Backed by transformers' FlaxCLIPModel with a locally-constructed ViT-B/32
config; real weights load from ``--clip_weights`` (a local HF-format dir),
otherwise random-init (documented, same external-artifact situation as SD).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

MATCH_PROMPTS = ["front face of an object", "side face of an object",
                 "back face of an object"]
VIEW_NAMES = ["front", "side", "back"]


def _vit_b32_config():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

    return CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                       num_hidden_layers=12, num_attention_heads=8,
                       max_position_embeddings=77, hidden_act="quick_gelu",
                       projection_dim=512),
        CLIPVisionConfig(hidden_size=768, intermediate_size=3072,
                         num_hidden_layers=12, num_attention_heads=12,
                         image_size=224, patch_size=32,
                         hidden_act="quick_gelu", projection_dim=512),
        projection_dim=512,
    )


class CLIPViewMatcher:
    def __init__(self, weights_dir: Optional[str] = None, seed: int = 0):
        from transformers import FlaxCLIPModel

        if weights_dir:
            try:
                self.model = FlaxCLIPModel.from_pretrained(weights_dir)
            except Exception as e:
                print(f"[WARN] CLIP weights load failed ({e}); random init.")
                self.model = FlaxCLIPModel(_vit_b32_config(), seed=seed)
        else:
            self.model = FlaxCLIPModel(_vit_b32_config(), seed=seed)
        self.params = self.model.params

        from customnerf_tpu.guidance.text import HashTokenizer
        self.tokenizer = HashTokenizer()
        if weights_dir:
            try:
                from transformers import CLIPTokenizer
                self.tokenizer = CLIPTokenizer.from_pretrained(weights_dir)
            except Exception:
                pass
        self._match_ids = self._tokenize(MATCH_PROMPTS)

    def _tokenize(self, prompts: List[str]):
        from customnerf_tpu.guidance.text import HashTokenizer, MAX_LEN
        if isinstance(self.tokenizer, HashTokenizer):
            return self.tokenizer(prompts)
        out = self.tokenizer(prompts, padding="max_length", max_length=MAX_LEN,
                             truncation=True, return_tensors="np")
        return out["input_ids"].astype(np.int32)

    def preprocess(self, images_nhwc):
        """[B,H,W,3] in [0,1] → CLIP input [B,3,224,224] (resize + normalize;
        reference nerf/clip.py:13-17)."""
        import jax

        b, h, w, _ = images_nhwc.shape
        x = jax.image.resize(images_nhwc, (b, 224, 224, 3), method="bilinear")
        x = (x - CLIP_MEAN) / CLIP_STD
        return jnp.transpose(x, (0, 3, 1, 2))

    def match_probs(self, images_nhwc) -> np.ndarray:
        """[B,H,W,3] render in [0,1] → softmax over (front, side, back)."""
        import jax

        pixel_values = self.preprocess(jnp.asarray(images_nhwc))
        out = self.model(input_ids=self._match_ids, pixel_values=pixel_values,
                         params=self.params)
        return np.asarray(jax.nn.softmax(out.logits_per_image, axis=-1))


    def image_embeds(self, images_nhwc) -> np.ndarray:
        """[B,H,W,3] in [0,1] → L2-normalized CLIP image embeddings."""
        pixel_values = self.preprocess(jnp.asarray(images_nhwc))
        out = self.model.get_image_features(pixel_values=pixel_values,
                                            params=self.params)
        out = np.asarray(out)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)

    def text_embeds(self, prompts: List[str]) -> np.ndarray:
        """prompts → L2-normalized CLIP text embeddings."""
        ids = self._tokenize(prompts)
        out = self.model.get_text_features(input_ids=ids, params=self.params)
        out = np.asarray(out)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)


def _embed_chunked(matcher: CLIPViewMatcher, images_nhwc, chunk: int):
    """image_embeds in chunks so full-resolution test frames ([B,H,W,3]
    floats pre-resize) never materialize on device all at once."""
    images_nhwc = np.asarray(images_nhwc)
    outs = [matcher.image_embeds(images_nhwc[i:i + chunk])
            for i in range(0, len(images_nhwc), chunk)]
    return np.concatenate(outs, axis=0)


def clip_score(matcher: CLIPViewMatcher, images_nhwc, prompt: str,
               chunk: int = 8) -> float:
    """Mean CLIP text-image cosine similarity over rendered views — the
    paper's Table-1-style editing-quality metric (CustomNeRF reports
    CLIP-score family metrics; the repo itself reproduces none, SURVEY §6).
    Meaningful once real CLIP weights are supplied via --clip_weights."""
    img = _embed_chunked(matcher, images_nhwc, chunk)  # [B, D]
    txt = matcher.text_embeds([prompt])                # [1, D]
    return float(np.mean(img @ txt.T))


def clip_directional_score(matcher: CLIPViewMatcher, images_before,
                           images_after, prompt_before: str,
                           prompt_after: str, chunk: int = 8) -> float:
    """CLIP directional similarity (Gal et al.): cosine between the image
    edit direction and the text edit direction, averaged over views.  The
    standard quantitative editing metric for text-driven 3D edits."""
    di = (_embed_chunked(matcher, images_after, chunk)
          - _embed_chunked(matcher, images_before, chunk))
    dt = matcher.text_embeds([prompt_after]) - matcher.text_embeds([prompt_before])
    di_n = di / np.maximum(np.linalg.norm(di, axis=-1, keepdims=True), 1e-8)
    dt_n = dt / np.maximum(np.linalg.norm(dt, axis=-1, keepdims=True), 1e-8)
    return float(np.mean(di_n @ dt_n.T))
