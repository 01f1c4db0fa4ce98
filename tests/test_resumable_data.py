"""Deterministic checkpoint/resume of the input pipeline
(`data/resumable.py`): Feistel bijection, sharding, exact mid-epoch
resume (incl. through the prefetch thread), and Trainer integration —
a resumed run reproduces the uninterrupted run's parameters exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from msvit_tpu.data.resumable import (
    IndexSampler,
    ResumableLoader,
    feistel_permutation,
)
from msvit_tpu.train.trainer import Trainer


@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000, 4097])
def test_feistel_is_a_permutation(n):
    out = feistel_permutation(np.arange(n), n, key=123)
    assert sorted(out.tolist()) == list(range(n))
    if n > 4:
        other = feistel_permutation(np.arange(n), n, key=124)
        assert out.tolist() != other.tolist()  # key actually matters


def test_epochs_differ_and_are_deterministic():
    s1 = IndexSampler(num_examples=64, batch_size=8, seed=3)
    it = iter(s1)
    epoch0 = np.concatenate([next(it) for _ in range(8)])
    epoch1 = np.concatenate([next(it) for _ in range(8)])
    assert sorted(epoch0.tolist()) == list(range(64))
    assert sorted(epoch1.tolist()) == list(range(64))
    assert epoch0.tolist() != epoch1.tolist()
    s2 = IndexSampler(num_examples=64, batch_size=8, seed=3)
    again = np.concatenate([next(iter(s2)) for _ in range(8)])
    np.testing.assert_array_equal(epoch0, again)


def test_shards_partition_each_epoch():
    per_shard = []
    for r in range(4):
        s = IndexSampler(
            num_examples=128, batch_size=4, seed=9, shard_index=r,
            shard_count=4, num_epochs=1,
        )
        per_shard.append(np.concatenate(list(s)))
    allidx = np.concatenate(per_shard)
    assert len(allidx) == 128
    assert sorted(allidx.tolist()) == list(range(128))


@pytest.mark.parametrize("prefetch", [0, 3])
def test_exact_midepoch_resume(prefetch):
    data = np.arange(100, dtype=np.float32)

    def fetch(idx):
        return {"x": data[idx]}

    def make(state=None):
        loader = ResumableLoader(
            IndexSampler(num_examples=100, batch_size=8, seed=7),
            fetch, prefetch=prefetch,
        )
        if state is not None:
            loader.load_state_dict(state)
        return loader

    ref = make()
    full = [np.asarray(next(ref)["x"]) for _ in range(30)]

    a = make()
    for _ in range(13):
        next(a)
    snap = a.state_dict()  # mid-epoch (12 batches/epoch at bs=8... 13th batch consumed)

    b = make(snap)
    rest = [np.asarray(next(b)["x"]) for _ in range(17)]
    np.testing.assert_array_equal(np.stack(full[13:]), np.stack(rest))


def test_config_mismatch_rejected():
    s = IndexSampler(num_examples=100, batch_size=8, seed=7)
    snap = s.state_dict()
    other = IndexSampler(num_examples=100, batch_size=16, seed=7)
    with pytest.raises(ValueError, match="batch_size"):
        other.load_state_dict(snap)


def test_trainer_resume_reproduces_uninterrupted_run(tmp_path):
    target = jnp.asarray([1.0, -2.0, 3.0])
    table = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (64, 3)), np.float32
    )

    def loss_fn(params, batch, rng):
        pred = batch["x"] @ params["w"]
        want = batch["x"] @ target
        loss = jnp.mean((pred - want) ** 2)
        return loss, {}

    def fetch(idx):
        return {"x": table[idx]}

    def loader():
        return ResumableLoader(
            IndexSampler(num_examples=64, batch_size=8, seed=5), fetch
        )

    def train(steps, ckpt_dir, resume=False):
        tr = Trainer(
            loss_fn, optax.adam(0.1), {"w": jnp.zeros(3)},
            checkpoint_dir=ckpt_dir, save_every=4, donate=False,
        )
        it = loader()
        if resume:
            tr.restore(it)
        tr.fit(it, steps, jax.random.PRNGKey(1))
        return tr

    # uninterrupted 12-step run
    ref = train(12, str(tmp_path / "ref"))
    # interrupted at 8 (last checkpoint = step 8), resumed to 12
    train(8, str(tmp_path / "ab"))
    resumed = train(12, str(tmp_path / "ab"), resume=True)
    assert resumed.step == 12
    np.testing.assert_allclose(
        np.asarray(resumed.params["w"]), np.asarray(ref.params["w"]),
        rtol=1e-6,
    )
