"""MoE FFN: routing semantics, capacity-bounded dispatch vs the dense
oracle, overflow drops, aux loss, expert-parallel sharding."""

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
    """Dense oracle: each token's output equals gate · (its argmax
    expert's MLP)."""
    cfg = _cfg(moe_impl="dense")
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


def test_dispatch_matches_dense():
    """With capacity ≥ tokens (no overflow) the dispatched MoE is exactly
    the dense MoE."""
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 7, 32))
    cfg_disp = _cfg(moe_impl="dispatch", moe_capacity_factor=4.0)
    cfg_dense = _cfg(moe_impl="dense")
    moe_d = MoEFFN(cfg_disp, num_experts=4)
    variables = moe_d.init(jax.random.PRNGKey(1), x)
    out_disp, aux_disp = moe_d.apply(variables, x)
    out_dense, aux_dense = MoEFFN(cfg_dense, num_experts=4).apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_disp), np.asarray(out_dense), atol=1e-5
    )
    np.testing.assert_allclose(float(aux_disp), float(aux_dense), atol=1e-6)


def test_dispatch_capacity_drops_overflow_tokens():
    """Tokens beyond an expert's queue capacity get zero FFN output
    (Switch overflow semantics), earlier tokens are unaffected."""
    cfg = _cfg(moe_impl="dispatch", moe_capacity_factor=0.25)  # C=1 at N=8,E=2
    moe = MoEFFN(cfg, num_experts=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    variables = moe.init(jax.random.PRNGKey(1), x)
    out, _ = moe.apply(variables, x)

    p = variables["params"]
    logits = np.asarray(x @ np.asarray(p["router"]["kernel"]) + np.asarray(p["router"]["bias"]))
    expert = logits.argmax(-1)[0]  # [8]
    seen = set()
    for n in range(8):
        e = int(expert[n])
        if e in seen:  # overflowed its capacity-1 queue
            np.testing.assert_allclose(np.asarray(out)[0, n], 0.0, atol=1e-6)
        else:
            seen.add(e)
            assert np.abs(np.asarray(out)[0, n]).max() > 0


def test_moe_trunk_forward_and_aux_sown():
    cfg = _cfg()  # default dispatch impl
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
    cfg = _cfg()  # dispatched experts sharded over "model"
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
