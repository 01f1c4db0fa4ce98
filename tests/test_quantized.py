"""int8 inference path: quantization primitives and end-to-end agreement
with the f32 model."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.models.base.quantized import (
    quantize_vit_params,
    quantized_vit_apply,
)
from msvit_tpu.ops.quant import int8_matmul, quantize_weight
from msvit_tpu.settings import parity_policy


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)) * 0.05, jnp.float32)
    got = int8_matmul(x, quantize_weight(w), out_dtype=jnp.float32)
    want = x @ w
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_quantized_vit_matches_f32_features():
    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    variables = model.init({"params": rng}, pix)
    ref = np.asarray(model.apply(variables, pix)["last_hidden_state"])

    qparams = quantize_vit_params(variables["params"])
    got = np.asarray(
        quantized_vit_apply(qparams, cfg, pix), dtype=np.float32
    )

    assert got.shape == ref.shape
    # int8 is approximate: require high feature cosine similarity
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.98, cos


def test_fully_int8_attention_path_matches_f32():
    """The serving path bench.py actually runs (calibrated scales +
    packed Pallas attention + fully-int8 attention data path), forced on
    via use_kernels so the interpret-mode kernels exercise the exact
    TPU branch on CPU (VERDICT r1 #2 done-criterion)."""
    from msvit_tpu.models.base.quantized import calibrate_act_scales

    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    variables = model.init({"params": rng}, pix)
    ref = np.asarray(model.apply(variables, pix)["last_hidden_state"])

    qparams = quantize_vit_params(variables["params"])
    scales = calibrate_act_scales(qparams, cfg, pix, use_kernels=False)
    assert "attn_0" in scales  # per-section attention scales recorded
    got = np.asarray(
        quantized_vit_apply(
            qparams, cfg, pix, act_scales=scales, use_kernels=True
        ),
        dtype=np.float32,
    )
    assert got.shape == ref.shape
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.98, cos
