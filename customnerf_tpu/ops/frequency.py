"""NeRF sin/cos frequency positional embedding.

Matches the reference embedder exactly (reference ``nerf/base.py:10-77``,
used for view directions in ``nerf/network_grid.py:114`` with multires=4):
output layout is ``[x, sin(2^0 x), cos(2^0 x), ..., sin(2^(m-1) x),
cos(2^(m-1) x)]`` → 3 + 3*2*multires dims (27 for multires=4).
"""

import jax.numpy as jnp


def freq_encode_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def freq_encode(x, multires: int = 4):
    """x: [..., D] → [..., D*(1+2*multires)]."""
    out = [x]
    for i in range(multires):
        freq = 2.0 ** i
        out.append(jnp.sin(x * freq))
        out.append(jnp.cos(x * freq))
    return jnp.concatenate(out, axis=-1)
