"""Scanned trunk (config.scan_layers): one nn.scan'd layer body must be
numerically identical to the unrolled loop — forward and gradients — with
params converted by models/base/scan.py, both directions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.scan import (
    stack_layer_params,
    unstack_layer_params,
)
from msvit_tpu.models.base.vit import ViTModel
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    base = dict(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return BaseViTConfig(**base)


def test_scan_matches_unrolled_forward_and_grad():
    cfg_u = _cfg()
    cfg_s = _cfg(scan_layers=True)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)

    model_u = ViTModel(cfg_u)
    model_s = ViTModel(cfg_s)
    params_u = model_u.init({"params": rng}, pix)
    params_s = stack_layer_params(params_u)

    out_u = model_u.apply(params_u, pix)["last_hidden_state"]
    out_s = model_s.apply(params_s, pix)["last_hidden_state"]
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-5, atol=1e-5
    )

    def loss_u(p):
        return jnp.sum(model_u.apply(p, pix)["last_hidden_state"] ** 2)

    def loss_s(p):
        return jnp.sum(model_s.apply(p, pix)["last_hidden_state"] ** 2)

    g_u = jax.grad(loss_u)(params_u)
    g_s = jax.grad(loss_s)(params_s)
    # compare in the unrolled layout
    g_s_unrolled = unstack_layer_params(g_s)
    flat_u = jax.tree_util.tree_leaves_with_path(g_u)
    flat_s = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(g_s_unrolled)
    )
    assert len(flat_u) == len(flat_s)
    for k, v in flat_u:
        np.testing.assert_allclose(
            np.asarray(v),
            np.asarray(flat_s[jax.tree_util.keystr(k)]),
            rtol=1e-4,
            atol=1e-4,
            err_msg=jax.tree_util.keystr(k),
        )


def test_scan_init_roundtrip():
    """Scanned init → unstack → stack is the identity; scanned init runs."""
    cfg_s = _cfg(scan_layers=True)
    rng = jax.random.PRNGKey(1)
    pix = jax.random.normal(rng, (1, 32, 32, 3), jnp.float32)
    model_s = ViTModel(cfg_s)
    params_s = model_s.init({"params": rng}, pix)
    rt = stack_layer_params(unstack_layer_params(params_s))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params_s,
        rt,
    )
    out = model_s.apply(params_s, pix)["last_hidden_state"]
    assert np.isfinite(np.asarray(out)).all()


def test_scan_with_remat_matches():
    cfg_u = _cfg()
    cfg_sr = _cfg(scan_layers=True, remat=True, remat_policy="dots")
    rng = jax.random.PRNGKey(2)
    pix = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)
    model_u = ViTModel(cfg_u)
    model_sr = ViTModel(cfg_sr)
    params_u = model_u.init({"params": rng}, pix)
    out_u = model_u.apply(params_u, pix)["last_hidden_state"]
    out_sr = model_sr.apply(stack_layer_params(params_u), pix)[
        "last_hidden_state"
    ]
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_sr), rtol=1e-5, atol=1e-5
    )


def test_scan_rejects_per_layer_features():
    cfg_s = _cfg(scan_layers=True)
    rng = jax.random.PRNGKey(3)
    pix = jax.random.normal(rng, (1, 32, 32, 3), jnp.float32)
    model_s = ViTModel(cfg_s)
    params_s = model_s.init({"params": rng}, pix)
    with pytest.raises(ValueError, match="scan_layers"):
        model_s.apply(params_s, pix, output_hidden_states=True)
