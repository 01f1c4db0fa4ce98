"""MoE FFN: routing semantics, aux loss, expert-parallel sharding."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.model import BaseViTEncoder
from msvit_tpu.models.base.moe import MoEFFN
from msvit_tpu.parallel import make_mesh, shard_params
from msvit_tpu.parallel.sharding import partition_spec_for_params
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_experts=4,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return BaseViTConfig(**base)


def test_moe_top1_equals_selected_expert():
    """Output of each token equals gate · (its argmax expert's MLP)."""
    cfg = _cfg()
    moe = MoEFFN(cfg, num_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    variables = moe.init(jax.random.PRNGKey(1), x)
    out, aux = moe.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(float(aux))

    p = variables["params"]
    logits = np.asarray(x @ np.asarray(p["router"]["kernel"]) + np.asarray(p["router"]["bias"]))
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expert = probs.argmax(-1)
    for b in range(2):
        for n in range(5):
            e = expert[b, n]
            h = np.asarray(x)[b, n] @ np.asarray(p["experts_in"])[e] + np.asarray(p["experts_in_bias"])[e]
            h = np.asarray(jax.nn.gelu(jnp.asarray(h), approximate=False))
            want = (h @ np.asarray(p["experts_out"])[e] + np.asarray(p["experts_out_bias"])[e]) * probs[b, n, e]
            np.testing.assert_allclose(np.asarray(out)[b, n], want, atol=1e-4)


def test_moe_trunk_forward_and_aux_sown():
    cfg = _cfg()
    enc = BaseViTEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    variables = enc.init(jax.random.PRNGKey(1), x)
    (out, _, _), inter = enc.apply(variables, x, mutable=["intermediates"])
    assert out.shape == x.shape
    aux = jax.tree.leaves(inter["intermediates"])
    assert len(aux) == cfg.num_hidden_layers  # one aux loss per layer
    for a in aux:
        assert float(a) >= 0.99  # Switch aux is ≥ 1 at balance


def test_moe_expert_parallel_matches_replicated():
    cfg = _cfg()
    enc = BaseViTEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 32))
    variables = enc.init(jax.random.PRNGKey(1), x)
    ref, _, _ = enc.apply(variables, x)

    spec = partition_spec_for_params(("mlp", "experts_in"), None)
    assert spec == P("model", None, None)
    mesh = make_mesh(tp=4)  # experts sharded 4-way on "model"
    sharded = shard_params(mesh, variables)
    got, _, _ = jax.jit(enc.apply)(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
