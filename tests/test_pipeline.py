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
