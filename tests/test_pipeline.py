"""Pipeline parallelism: GPipe over a 4-stage mesh ≡ sequential encoder,
forward and backward (virtual CPU devices)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTEncoder, BaseViTLayer
from msvit_tpu.parallel.pipeline import (
    gpipe,
    make_layer_stage_fn,
    split_layers_into_stages,
)
from msvit_tpu.settings import parity_policy


def _setup(num_layers=8, num_stages=4):
    cfg = BaseViTConfig(
        hidden_size=32,
        num_hidden_layers=num_layers,
        num_attention_heads=4,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    enc = BaseViTEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12, 32))
    params = enc.init(jax.random.PRNGKey(1), x)["params"]
    mesh = Mesh(np.asarray(jax.devices()[:num_stages]), ("stage",))
    stage_params = split_layers_into_stages(params, num_stages)
    stage_fn = make_layer_stage_fn(BaseViTLayer(cfg))
    run = gpipe(stage_fn, num_stages, num_microbatches=4, mesh=mesh)
    return cfg, enc, params, stage_params, run, x


def test_gpipe_forward_matches_sequential():
    cfg, enc, params, stage_params, run, x = _setup()
    ref, _, _ = enc.apply({"params": params}, x)
    x_mb = x.reshape(4, 2, 12, 32)  # 4 microbatches of 2
    got = run(stage_params, x_mb).reshape(8, 12, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gpipe_grads_match_sequential():
    cfg, enc, params, stage_params, run, x = _setup()

    def loss_seq(p):
        out, _, _ = enc.apply({"params": p}, x)
        return jnp.sum(out**2)

    def loss_pp(sp):
        out = run(sp, x.reshape(4, 2, 12, 32))
        return jnp.sum(out**2)

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.grad(loss_pp)(stage_params)
    g_seq_stacked = split_layers_into_stages(g_seq, 4)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# ---- full-model pipeline (embeddings + trunk + LN + head) ----

import optax  # noqa: E402

from msvit_tpu.models.base.vit import ViTForImageClassification  # noqa: E402
from msvit_tpu.parallel.pipeline_vit import (  # noqa: E402
    make_pipelined_classifier_apply,
    make_pipelined_loss_fn,
    pipeline_params_from_full,
    shard_pipeline_params,
)
from msvit_tpu.train.trainer import Trainer  # noqa: E402


def _full_setup(num_stages=4, num_microbatches=4, batch=8):
    cfg = BaseViTConfig(
        hidden_size=32,
        num_hidden_layers=8,
        num_attention_heads=4,
        image_size=16,
        patch_size=8,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = ViTForImageClassification(cfg, num_labels=10)
    pix = jax.random.normal(jax.random.PRNGKey(0), (batch, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), pix[:1])["params"]
    mesh = Mesh(np.asarray(jax.devices()[:num_stages]), ("stage",))
    pp = shard_pipeline_params(
        mesh, pipeline_params_from_full(params, num_stages)
    )
    return cfg, model, params, mesh, pp, pix


def test_full_model_pipeline_forward_matches_sequential():
    cfg, model, params, mesh, pp, pix = _full_setup()
    ref = model.apply({"params": params}, pix)
    apply = make_pipelined_classifier_apply(cfg, 10, 4, 4, mesh)
    got = apply(pp, pix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_full_model_pipeline_forward_with_mask():
    cfg, model, params, mesh, pp, pix = _full_setup()
    n = cfg.num_patches + 1
    mask = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.8, (pix.shape[0], 1, n, n)
    )
    mask = jnp.logical_or(mask, jnp.eye(n, dtype=bool)[None, None])
    out = model.apply({"params": params}, pix)  # unmasked differs

    # sequential reference with the mask threaded through ViTModel
    from msvit_tpu.models.base.vit import ViTModel

    seq = ViTModel(cfg).apply(
        {"params": {k: v for k, v in params["vit"].items()}},
        pix,
        attention_mask=mask,
    )["last_hidden_state"]

    apply = make_pipelined_classifier_apply(cfg, 10, 4, 4, mesh)
    got = apply(pp, pix, attention_mask=mask)
    # head(LN(seq))[CLS] must equal the pipelined logits
    from msvit_tpu.models.base.norm import LayerNorm
    import flax.linen as nn

    h = LayerNorm(
        epsilon=cfg.layer_norm_eps,
        out_dtype=cfg.policy.output,
        param_dtype=cfg.policy.param,
    ).apply({"params": params["vit"]["layernorm"]}, seq)
    want = nn.Dense(10, dtype=cfg.policy.compute, param_dtype=cfg.policy.param).apply(
        {"params": params["classifier"]}, h[:, 0]
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), atol=1e-4
    )
    assert not np.allclose(
        np.asarray(got), np.asarray(model.apply({"params": params}, pix))
    )
    del out


def test_full_model_pipelined_training_step_matches_sequential():
    """One Trainer-driven AdamW step on the pipelined model ≡ the same
    step on the sequential model (params compared post-update)."""
    cfg, model, params, mesh, pp, pix = _full_setup()
    labels = jnp.arange(8) % 10
    batch = {"pixel_values": pix, "labels": labels}

    def seq_loss(p, b, rng):
        logits = model.apply({"params": p}, b["pixel_values"])
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, b["labels"])
        )
        return loss, {}

    pp_loss = make_pipelined_loss_fn(cfg, 10, 4, 4, mesh)

    opt = optax.adamw(1e-3)
    t_seq = Trainer(seq_loss, opt, params, donate=False)
    t_pp = Trainer(pp_loss, opt, pp, donate=False)
    rng = jax.random.PRNGKey(0)
    t_seq.fit([batch], num_steps=1, rng=rng)
    t_pp.fit([batch], num_steps=1, rng=rng)

    want = pipeline_params_from_full(t_seq.params, 4)
    for a, b in zip(
        jax.tree.leaves(t_pp.params), jax.tree.leaves(want)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
