"""int8 multistate serving path: masked int8 attention kernel and the
end-to-end quantized multistate forward (interpret-mode kernels on CPU,
exercising the exact TPU branches)."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.clustering import SpectralClusteringConfig
from msvit_tpu.models.multistate import (
    MultiStateViTConfig,
    MultiStateViTEncoderModel,
    calibrate_multistate_act_scales,
    quantize_multistate_params,
    quantized_multistate_apply,
)
from msvit_tpu.ops.attention import xla_attention
from msvit_tpu.ops.packed_attention import packed_attention_int8_masked
from msvit_tpu.settings import parity_policy


def _quantize_sections(qkv, d):
    """float [B,N,3D] → (int8, [3] per-section scales)."""
    sec_max = jnp.max(
        jnp.abs(qkv.reshape(-1, 3, d)), axis=(0, 2)
    )  # [3]
    scales = jnp.maximum(sec_max, 1e-8) / 127.0
    cols = jnp.repeat(scales, d)
    q = jnp.clip(jnp.round(qkv / cols), -127, 127).astype(jnp.int8)
    return q, scales


def _reference_masked(qkv_q, scales, num_heads, mask):
    """f32 oracle on the dequantized int8 qkv (so the comparison isolates
    the kernel's prob quantization, not the input quantization)."""
    b, n, d3 = qkv_q.shape
    d = d3 // 3
    dh = d // num_heads
    cols = jnp.repeat(scales, d)
    deq = qkv_q.astype(jnp.float32) * cols
    t = deq.reshape(b, n, 3, num_heads, dh).transpose(2, 0, 3, 1, 4)
    out, _ = xla_attention(t[0], t[1], t[2], mask=mask)
    return jnp.swapaxes(out, 1, 2).reshape(b, n, d)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_int8_masked_kernel_additive_mask():
    rng = np.random.default_rng(0)
    b, n, h, dh = 2, 24, 4, 64
    d = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
    qkv_q, scales = _quantize_sections(qkv, d)
    # multistate-style soft mask: 0 / -100 additive, [B, 1, N, N]
    mbool = jnp.asarray(rng.random((b, 1, n, n)) > 0.3)
    mask = jnp.where(mbool, 0.0, -100.0).astype(jnp.float32)

    got = packed_attention_int8_masked(qkv_q, scales, h, mask=mask)
    want = _reference_masked(qkv_q, scales, h, mask)
    assert got.shape == want.shape
    assert _cos(got, want) > 0.995


def test_int8_masked_kernel_bool_mask_and_no_mask():
    rng = np.random.default_rng(1)
    b, n, h, dh = 1, 16, 2, 64
    d = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
    qkv_q, scales = _quantize_sections(qkv, d)
    mask = jnp.asarray(rng.random((b, 1, n, n)) > 0.3)
    # keep one attendable key per row so bool-masked rows stay defined
    mask = mask.at[:, :, :, 0].set(True)

    got = packed_attention_int8_masked(qkv_q, scales, h, mask=mask)
    want = _reference_masked(qkv_q, scales, h, mask)
    assert _cos(got, want) > 0.995

    got_nm = packed_attention_int8_masked(qkv_q, scales, h, mask=None)
    want_nm = _reference_masked(qkv_q, scales, h, None)
    assert _cos(got_nm, want_nm) > 0.995


def test_int8_masked_kernel_int8_out():
    rng = np.random.default_rng(2)
    b, n, h, dh = 1, 16, 2, 64
    d = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * d)), jnp.float32)
    qkv_q, scales = _quantize_sections(qkv, d)
    want = _reference_masked(qkv_q, scales, h, None)
    s_out = float(jnp.max(jnp.abs(want)) / 127.0)
    got_q = packed_attention_int8_masked(
        qkv_q, scales, h, out_inv_scale=1.0 / s_out, int8_out=True
    )
    assert got_q.dtype == jnp.int8
    assert _cos(got_q.astype(jnp.float32) * s_out, want) > 0.99


def _tiny_config(**kw):
    defaults = dict(
        hidden_size=256,
        num_attention_heads=4,  # dh=64 → the kernel's 128-lane head pairs
        num_hidden_layers=3,
        image_size=64,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
        clustering=SpectralClusteringConfig(
            ncut_dim=4, num_sample=16, max_clusters=4,
            eigenvalue_threshold=0.1,
        ),
    )
    defaults.update(kw)
    return MultiStateViTConfig(**defaults)


def test_quantized_multistate_matches_f32_trunk():
    """No clustering events (pregeneration beyond depth): isolates the
    int8 trunk + soft-mask numerics against the f32 flax model."""
    cfg = _tiny_config(pregeneration_period=99, generation_period=2)
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 64, 64, 3))
    variables = model.init({"params": rng, "clustering": rng}, pix)
    ref = model.apply(variables, pix, rng=jax.random.PRNGKey(7))

    qp = quantize_multistate_params(variables["params"])
    scales = calibrate_multistate_act_scales(
        qp, cfg, pix, jax.random.PRNGKey(7), use_kernels=False
    )
    assert "attn_0" in scales
    for mode in ("bf16", "int8", "banded"):
        got = quantized_multistate_apply(
            qp, cfg, pix, jax.random.PRNGKey(7), act_scales=scales,
            use_kernels=True, attn_mode=mode,
        )
        assert got["last_hidden_state"].shape == ref["last_hidden_state"].shape
        assert _cos(got["last_hidden_state"], ref["last_hidden_state"]) > 0.98
        assert _cos(got["cluster_tokens"], ref["cluster_tokens"]) > 0.98
        # pooler attentions come from the (bf16) last layer in both paths
        assert _cos(
            got["receiver_to_transmitter_attentions"],
            ref["receiver_to_transmitter_attentions"],
        ) > 0.97


def test_quantized_multistate_with_clustering_smoke():
    """Full path with a live clustering event: shapes, finiteness, and a
    valid cluster state (the partition itself may legitimately differ
    from the bf16 model's on near-tie affinities)."""
    cfg = _tiny_config(pregeneration_period=1, generation_period=2)
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(3)
    pix = jax.random.normal(rng, (2, 64, 64, 3))
    variables = model.init({"params": rng, "clustering": rng}, pix)

    qp = quantize_multistate_params(variables["params"])
    scales = calibrate_multistate_act_scales(
        qp, cfg, pix, jax.random.PRNGKey(5), use_kernels=False
    )
    out = quantized_multistate_apply(
        qp, cfg, pix, jax.random.PRNGKey(5), act_scales=scales,
        use_kernels=True,
    )
    n = (64 // 16) ** 2
    assert out["last_hidden_state"].shape == (2, n, 256)
    assert np.all(np.isfinite(np.asarray(out["last_hidden_state"],
                                         np.float32)))
    assert out["cluster_tokens"].shape == (2, 4, 256)
    nc = np.asarray(out["num_clusters"])
    assert np.all(nc >= 1) and np.all(nc <= 4)
    ci = np.asarray(out["last_cluster_indices"])
    assert ci.shape == (2, n) and ci.min() >= 0 and ci.max() < 4
    assert out["receiver_to_transmitter_attentions"].shape[2:] == (4, 4)


def test_quantized_multistate_banded_with_clustering():
    """attn_mode='banded' through a live clustering event: the sorted
    token machinery must produce the SAME cluster assignments as the
    bf16 mode (clustering sees original-order tokens and the trunk
    numerics differences are ~bf16-noise; affinities are computed in
    f32 from the same int8 GEMM outputs) and closely matching outputs."""
    cfg = _tiny_config(pregeneration_period=1, generation_period=2)
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(3)
    pix = jax.random.normal(rng, (2, 64, 64, 3))
    variables = model.init({"params": rng, "clustering": rng}, pix)

    qp = quantize_multistate_params(variables["params"])
    scales = calibrate_multistate_act_scales(
        qp, cfg, pix, jax.random.PRNGKey(5), use_kernels=False
    )
    outs = {}
    for mode in ("bf16", "banded"):
        outs[mode] = quantized_multistate_apply(
            qp, cfg, pix, jax.random.PRNGKey(5), act_scales=scales,
            use_kernels=True, attn_mode=mode,
        )
    ci_b = np.asarray(outs["banded"]["last_cluster_indices"])
    assert np.all(np.isfinite(
        np.asarray(outs["banded"]["last_hidden_state"], np.float32)
    ))
    assert ci_b.min() >= 0 and ci_b.max() < 4
    if np.array_equal(
        ci_b, np.asarray(outs["bf16"]["last_cluster_indices"])
    ):
        # identical partitions (the expected case): outputs must agree
        assert _cos(
            outs["banded"]["last_hidden_state"],
            outs["bf16"]["last_hidden_state"],
        ) > 0.98
