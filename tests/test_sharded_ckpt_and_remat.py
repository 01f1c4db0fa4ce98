"""Sharded checkpoint roundtrip and rematerialization equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.models.base import BaseViTConfig, ViTModel
from msvit_tpu.parallel import make_mesh, shard_params
from msvit_tpu.settings import parity_policy
from msvit_tpu.train import restore_checkpoint, save_checkpoint


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Save a TP-sharded pytree, restore it onto the mesh, values equal."""
    mesh = make_mesh(tp=2)
    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    params = model.init({"params": rng}, pix)
    sharded = shard_params(mesh, params)

    save_checkpoint(str(tmp_path / "ck"), 1, sharded)
    like = jax.tree.map(jnp.zeros_like, sharded)
    restored = restore_checkpoint(str(tmp_path / "ck"), like)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_matches_no_remat():
    """config.remat changes memory, not math: outputs and grads equal."""
    def build(remat):
        return ViTModel(
            BaseViTConfig(
                hidden_size=32,
                num_hidden_layers=2,
                num_attention_heads=4,
                image_size=32,
                patch_size=16,
                policy=parity_policy(),
                attn_implementation="xla",
                remat=remat,
            )
        )

    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3))
    m0, m1 = build(False), build(True)
    params = m0.init({"params": rng}, pix)

    def loss(m):
        def f(p, x):
            return jnp.sum(m.apply(p, x)["last_hidden_state"] ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(params, pix)
    l1, g1 = jax.value_and_grad(loss(m1))(params, pix)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)