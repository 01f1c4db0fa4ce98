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


def test_async_save_is_nonblocking(tmp_path):
    """CheckpointManager saves off the step path: maybe_save returns while
    the (~64 MB) write is still in flight, and the snapshot is taken at
    call time (rebinding the source arrays afterwards cannot corrupt it)."""
    from msvit_tpu.train.checkpoint import CheckpointManager

    state = {
        "big": jnp.arange(16 * 1024 * 1024, dtype=jnp.float32),
        "step": jnp.asarray(7),
    }
    want = np.asarray(state["big"])
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every=1)
    try:
        assert mgr.maybe_save(1, state)
        in_flight = mgr.is_saving()  # observed right after return
        state["big"] = jnp.zeros_like(state["big"])  # rebind source
        mgr.wait()
        assert in_flight, "64 MB save completed before maybe_save returned"
        _, restored = mgr.restore_latest(
            {"big": jnp.zeros_like(state["big"]), "step": jnp.asarray(0)}
        )
        np.testing.assert_array_equal(np.asarray(restored["big"]), want)
        assert int(restored["step"]) == 7
    finally:
        mgr.close()


def test_restore_fsdp_sharded_onto_plain_dp(tmp_path):
    """Save params sharded by FSDP (leading axes split over "data" on the
    8-device mesh), restore them onto a plain-DP target (replicated
    params): values survive, and restored leaves carry the *target*
    sharding — the production reshard-on-restore path (VERDICT r3 item 7)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msvit_tpu.parallel.train_step import make_sharded_train_step
    from msvit_tpu.train import restore_checkpoint, save_checkpoint

    mesh = make_mesh(tp=1)
    assert mesh.shape["data"] == 8
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
    pix = jax.random.normal(rng, (8, 32, 32, 3))
    params = model.init({"params": rng}, pix)

    def loss_fn(p, batch, key):
        out = model.apply(p, batch)["last_hidden_state"]
        return jnp.sum(out.astype(jnp.float32) ** 2), {}

    _, fsdp_params, _, _ = make_sharded_train_step(
        loss_fn, optax.sgd(1e-3), mesh, params, fsdp=True
    )
    # really FSDP: at least one leaf is split over "data"
    assert any(
        s.sharding.spec and s.sharding.spec[0] == "data"
        for s in jax.tree.leaves(fsdp_params)
        if hasattr(s, "sharding")
    )
    save_checkpoint(str(tmp_path / "ck"), 3, fsdp_params)

    replicated = NamedSharding(mesh, P())
    like = jax.tree.map(
        lambda x: jax.device_put(jnp.zeros_like(x), replicated), fsdp_params
    )
    restored = restore_checkpoint(str(tmp_path / "ck"), like)
    for got, src in zip(jax.tree.leaves(restored), jax.tree.leaves(fsdp_params)):
        assert got.sharding.is_equivalent_to(replicated, got.ndim)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(got)), np.asarray(jax.device_get(src))
        )