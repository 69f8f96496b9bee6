"""Misc: seeding (reference provider_utils.py:305-312 seeds torch/np; here
numpy + the documented JAX key-threading root)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax
    return jax.random.PRNGKey(seed)
