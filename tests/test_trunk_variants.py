"""Trunk config variants: SwiGLU FFN, stochastic depth, dropout rngs,
bf16 policy numerics sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.models.base.model import BaseViTEncoder
from msvit_tpu.settings import Policy, parity_policy


def test_swiglu_ffn_forward_and_shapes():
    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        use_swiglu_ffn=True,
        mlp_ratio=4.0,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    # 2/3 ratio rounded to a multiple of 8 (reference `modeling_base.py:276-277`)
    assert cfg.swiglu_hidden_size == (int(256 * 2 / 3) + 7) // 8 * 8
    enc = BaseViTEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 64))
    params = enc.init(jax.random.PRNGKey(1), x)
    out, _, _ = enc.apply(params, x)
    assert out.shape == x.shape
    k = params["params"]["layer_0"]["mlp"]["weights_in"]["kernel"]
    assert k.shape == (64, 2 * cfg.swiglu_hidden_size)


def test_drop_path_training_vs_eval():
    cfg = BaseViTConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        drop_path_rate=0.5,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    enc = BaseViTEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 32))
    params = enc.init(jax.random.PRNGKey(1), x)
    # eval: deterministic, droppath off
    a, _, _ = enc.apply(params, x, deterministic=True)
    b, _, _ = enc.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # train: stochastic per-sample paths — different draws differ
    t1, _, _ = enc.apply(
        params, x, deterministic=False, rngs={"droppath": jax.random.PRNGKey(2)}
    )
    t2, _, _ = enc.apply(
        params, x, deterministic=False, rngs={"droppath": jax.random.PRNGKey(3)}
    )
    assert float(jnp.abs(t1 - t2).max()) > 0


def test_bf16_policy_close_to_f32():
    cfg32 = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    cfg16 = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=Policy("float32", "bfloat16", "bfloat16"),
        attn_implementation="xla",
    )
    m32, m16 = ViTModel(cfg32), ViTModel(cfg16)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    params = m32.init({"params": rng}, pix)  # same param tree for both
    a = np.asarray(m32.apply(params, pix)["last_hidden_state"])
    b = np.asarray(
        m16.apply(params, pix)["last_hidden_state"], dtype=np.float32
    )
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
