"""Multi-device (8 virtual CPU chips) sharding tests — SURVEY §4 (e)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTForImageClassification
from msvit_tpu.parallel import make_mesh, shard_params
from msvit_tpu.parallel.train_step import make_sharded_train_step
from msvit_tpu.settings import parity_policy


def _tiny_model():
    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    return ViTForImageClassification(cfg, num_labels=10)


def test_dp_tp_train_step_runs_and_matches_single_device():
    """One sharded train step (dp=4, tp=2) must produce the same updated
    params as the unsharded step (GSPMD correctness check)."""
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (8, 32, 32, 3), dtype=jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
    params = model.init({"params": rng}, pix[:1])

    def loss_fn(p, batch, _rng):
        logits = model.apply(p, batch[0])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[1]
        ).mean(), {}

    opt = optax.sgd(0.1)

    # single device reference
    o0 = opt.init(params)
    (l_ref, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
        params, (pix, labels), rng
    )
    upd, _ = opt.update(g, o0, params)
    p_ref = optax.apply_updates(params, upd)

    # sharded
    mesh = make_mesh(tp=2)
    step, p_sh, o_sh, batch_shard = make_sharded_train_step(
        loss_fn, opt, mesh, params, donate=False
    )
    batch = jax.device_put((pix, labels), batch_shard)
    p_new, _, loss, _ = step(p_sh, o_sh, batch, rng)

    np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zero1_train_step_matches_and_shards_opt_state():
    """ZeRO-1 (optimizer state sharded over "data") must produce the same
    updated params as the non-ZeRO sharded adamw step (itself covered vs
    single-device above), with the adam m/v leaves actually data-sharded.

    The comparison baseline is the sharded step, not the eager one: GSPMD
    reduces gradients in a different order than a single device, and two
    adamw steps amplify that f32 noise to ~3e-4 on near-zero-grad params
    — identically with and without ZeRO-1 (measured)."""
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (8, 32, 32, 3), dtype=jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
    params = model.init({"params": rng}, pix[:1])

    def loss_fn(p, batch, _rng):
        logits = model.apply(p, batch[0])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[1]
        ).mean(), {}

    opt = optax.adamw(1e-2)

    # non-ZeRO sharded reference, two steps
    mesh = make_mesh(tp=2)
    step0, p_ref, o_ref, bs0 = make_sharded_train_step(
        loss_fn, opt, mesh, params, donate=False, zero1=False
    )
    batch0 = jax.device_put((pix, labels), bs0)
    for _ in range(2):
        p_ref, o_ref, _, _ = step0(p_ref, o_ref, batch0, rng)

    step, p_sh, o_sh, batch_shard = make_sharded_train_step(
        loss_fn, opt, mesh, params, donate=False, zero1=True
    )
    # the big optimizer tensors must be sharded on "data"
    def _spec_axes(spec):
        axes = []
        for e in spec:
            if isinstance(e, (tuple, list)):
                axes.extend(e)
            elif e is not None:
                axes.append(e)
        return axes

    data_sharded = [
        leaf
        for leaf in jax.tree.leaves(o_sh)
        if hasattr(leaf, "sharding")
        and "data" in _spec_axes(leaf.sharding.spec)
    ]
    assert data_sharded, "no optimizer-state leaf got ZeRO-1 sharded"

    batch = jax.device_put((pix, labels), batch_shard)
    for _ in range(2):
        p_sh, o_sh, loss, _ = step(p_sh, o_sh, batch, rng)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_forward_matches_replicated():
    """TP-sharded forward ≡ replicated forward."""
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (4, 32, 32, 3), dtype=jnp.float32)
    params = model.init({"params": rng}, pix[:1])
    ref = model.apply(params, pix)

    mesh = make_mesh(tp=4)
    p_sh = shard_params(mesh, params)
    got = jax.jit(model.apply)(p_sh, pix)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_multistate_dp_forward_matches_replicated():
    """DP-sharded multistate forward (clustering included) ≡ unsharded —
    the non-base families ride the same declarative sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msvit_tpu.models.clustering import SpectralClusteringConfig
    from msvit_tpu.models.multistate import (
        MultiStateViTConfig,
        MultiStateViTEncoderModel,
    )

    cfg = MultiStateViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=8,
        pregeneration_period=1,
        generation_period=1,
        policy=parity_policy(),
        attn_implementation="xla",
        clustering=SpectralClusteringConfig(
            ncut_dim=4, num_sample=16, max_clusters=4,
            eigenvalue_threshold=0.1,
        ),
    )
    model = MultiStateViTEncoderModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (8, 32, 32, 3), dtype=jnp.float32)
    params = jax.jit(model.init)(
        {"params": rng, "clustering": rng}, pix[:1]
    )
    key = jax.random.PRNGKey(3)
    ref = model.apply(params, pix, rngs={"clustering": key})

    mesh = make_mesh(tp=1)
    p_sh = shard_params(mesh, params)
    pix_sh = jax.device_put(
        pix, NamedSharding(mesh, P("data", None, None, None))
    )
    got = jax.jit(
        lambda p, x: model.apply(p, x, rngs={"clustering": key})
    )(p_sh, pix_sh)
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]),
        atol=1e-5,
    )


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 197, 768)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_distributed_helpers_single_process():
    """Multi-host glue degrades to identity on one process: host_shard is
    (0,1), global_batch produces a mesh-sharded global array equal to the
    local data, and initialize() is a no-op."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from msvit_tpu.parallel import make_mesh
    from msvit_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single-process
    assert dist.host_shard() == (0, 1)
    assert dist.host_batch_size(32) == 32
    mesh = make_mesh(tp=1)
    local = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = dist.global_batch(mesh, local)
    assert g["x"].shape == (8, 2)
    assert len(g["x"].sharding.device_set) == 8  # sharded over the mesh
    np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])


def test_fsdp_train_step_matches_and_shards_params():
    """FSDP (ZeRO-3: params sharded over "data") must produce the same
    updated params as the non-FSDP sharded step, with the big param
    leaves actually data-sharded (so grads and opt state inherit it)
    and the per-device shard strictly smaller than the logical array.

    The equivalence comparison uses SGD: FSDP's reduce-scatter sums
    gradients in a different order than the baseline's all-reduce, and
    adamw's m̂/(√v̂+ε) amplifies that f32 dust by ~lr/ε on near-zero-grad
    params (observed 1.9e-4 after two steps) — SGD keeps the comparison
    conditioning-free.  adamw is then exercised separately for state
    sharding + finiteness."""
    model = _tiny_model()
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (8, 32, 32, 3), dtype=jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 10)
    params = model.init({"params": rng}, pix[:1])

    def loss_fn(p, batch, _rng):
        logits = model.apply(p, batch[0])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[1]
        ).mean(), {}

    mesh = make_mesh(tp=2)  # dp=4, tp=2
    opt = optax.sgd(0.1)

    step0, p_ref, o_ref, bs0 = make_sharded_train_step(
        loss_fn, opt, mesh, params, donate=False
    )
    batch0 = jax.device_put((pix, labels), bs0)
    for _ in range(2):
        p_ref, o_ref, _, _ = step0(p_ref, o_ref, batch0, rng)

    step, p_sh, o_sh, batch_shard = make_sharded_train_step(
        loss_fn, opt, mesh, params, donate=False, fsdp=True
    )

    def _axes(spec):
        out = []
        for e in spec:
            if isinstance(e, (tuple, list)):
                out.extend(e)
            elif e is not None:
                out.append(e)
        return out

    qkv = p_sh["params"]["vit"]["encoder"]["layer_0"]["attention"][
        "qkv_kernel"
    ]
    assert "data" in _axes(qkv.sharding.spec), "qkv kernel not fsdp-sharded"
    assert "model" in _axes(qkv.sharding.spec), "TP sharding lost under fsdp"
    # local shard strictly smaller than the logical array
    assert qkv.addressable_shards[0].data.size < qkv.size

    batch = jax.device_put((pix, labels), batch_shard)
    for _ in range(2):
        p_sh, o_sh, loss, _ = step(p_sh, o_sh, batch, rng)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # adamw under fsdp: m/v inherit the param sharding; one step runs
    adam = optax.adamw(1e-2)
    astep, ap, ao, abs_ = make_sharded_train_step(
        loss_fn, adam, mesh, params, donate=False, fsdp=True
    )
    m_qkv = None
    for leaf in jax.tree.leaves(ao):
        if hasattr(leaf, "shape") and leaf.shape == qkv.shape:
            m_qkv = leaf
            break
    assert m_qkv is not None and "data" in _axes(m_qkv.sharding.spec)
    ap, ao, aloss, _ = astep(ap, ao, jax.device_put((pix, labels), abs_), rng)
    assert np.isfinite(float(aloss))
