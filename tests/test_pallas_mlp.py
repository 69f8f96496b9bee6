"""Pallas fused-MLP kernel vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from customnerf_tpu.ops import fused_mlp_pallas as fmp


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    B, in_dim, hid, dir_dim, out = 300, 32, 64, 27, 4
    x = jnp.asarray(rng.randn(B, in_dim).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.randn(B, dir_dim).astype(np.float32) * 0.1)
    weights = [
        jnp.asarray(rng.randn(in_dim, hid).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(hid, hid).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(hid, hid).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(hid, hid).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(hid, 1).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(dir_dim + hid, hid).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(hid, out).astype(np.float32) * 0.2),
    ]
    return x, v, weights


def test_pallas_matches_reference_interpret(problem, monkeypatch):
    """On CPU, run the kernel in interpreter mode and compare."""
    from jax.experimental import pallas as pl
    x, v, weights = problem

    orig_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(fmp.pl, "pallas_call", interp_call)

    sig_p, rgb_p = fmp._pallas_forward(x, v, tuple(weights))
    sig_r, rgb_r = fmp._reference_forward(x, v, tuple(weights))
    np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_r),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_backward_matches_reference(problem, monkeypatch):
    from jax.experimental import pallas as pl
    x, v, weights = problem

    orig_call = pl.pallas_call

    def interp_call(*a, **kw):
        kw["interpret"] = True
        return orig_call(*a, **kw)

    monkeypatch.setattr(fmp.pl, "pallas_call", interp_call)

    def loss_pallas(x, w):
        s, r = fmp.fused_field_mlp(x, v, w)
        return jnp.sum(s ** 2) + jnp.sum(r ** 2)

    def loss_ref(x, w):
        s, r = fmp._reference_forward(x, v, tuple(w))
        return jnp.sum(s ** 2) + jnp.sum(r ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, list(weights))
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, list(weights))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(gw_p, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
