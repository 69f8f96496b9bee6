"""Class/regularization image retrieval for Custom Diffusion.

Port of the reference's LAION retrieval script (``custom_diffusion/retrieve.py``):
query clip-retrieval for ``num_class_images`` matching a class prompt and
write the images + caption.txt/urls.txt/images.txt manifests.  Network access
(and the clip_retrieval package) are unavailable in some deployments — in
that case this module falls back to *generating* class images with the local
SD sampler (the reference trainer has the same fallback,
train_custom_diffusion.py:706-769).
"""

from __future__ import annotations

import os
from typing import Optional


def retrieve(class_prompt: str, class_images_dir: str, num_class_images: int,
             guidance=None, seed: int = 0) -> int:
    """Populate class_images_dir; returns the number of images available."""
    os.makedirs(class_images_dir, exist_ok=True)
    existing = [f for f in os.listdir(class_images_dir)
                if f.lower().endswith((".jpg", ".jpeg", ".png"))]
    if len(existing) >= num_class_images:
        return len(existing)

    try:
        return _retrieve_laion(class_prompt, class_images_dir, num_class_images)
    except Exception as e:
        print(f"[WARN] clip-retrieval unavailable ({e}); "
              f"generating class images with local SD instead.")
        if guidance is None:
            raise RuntimeError(
                "no network retrieval and no guidance model provided — "
                "cannot produce class images") from e
        return _generate_with_sd(class_prompt, class_images_dir,
                                 num_class_images, guidance, seed)


def _retrieve_laion(class_prompt, out_dir, num):
    from clip_retrieval.clip_client import ClipClient  # optional dep

    client = ClipClient(
        url="https://knn.laion.ai/knn-service",
        indice_name="laion_400m",
        num_images=num * 2,
        aesthetic_weight=0.1,
    )
    results = client.query(text=class_prompt)
    import urllib.request

    count = 0
    captions, urls, names = [], [], []
    for r in results:
        if count >= num:
            break
        try:
            name = os.path.join(out_dir, f"{count:05d}.jpg")
            urllib.request.urlretrieve(r["url"], name)
            captions.append(r.get("caption", class_prompt))
            urls.append(r["url"])
            names.append(name)
            count += 1
        except Exception:
            continue
    for fname, rows in (("caption.txt", captions), ("urls.txt", urls),
                        ("images.txt", names)):
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("\n".join(rows))
    return count


def _generate_with_sd(class_prompt, out_dir, num, guidance, seed):
    import cv2
    import jax
    import numpy as np

    from customnerf_tpu.guidance.sampler import ddim_sample

    key = jax.random.PRNGKey(seed)
    names, captions = [], []
    for i in range(num):
        key, sub = jax.random.split(key)
        img = ddim_sample(guidance, class_prompt, sub, num_steps=25)
        name = os.path.join(out_dir, f"{i:05d}.jpg")
        cv2.imwrite(name, cv2.cvtColor(
            (np.asarray(img) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        names.append(name)
        captions.append(class_prompt)
    for fname, rows in (("caption.txt", captions), ("images.txt", names)):
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("\n".join(rows))
    return num
