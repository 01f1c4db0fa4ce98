"""Dynamic micro-batching server (`msvit_tpu/serve.py`): results match
direct forward, buckets stay static, concurrent submitters all get the
right answers, and errors propagate to futures."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.serve import BatchingServer


def _model():
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    seen_shapes = []

    @jax.jit
    def apply_fn(x):
        return x @ w

    def tracking(x):
        seen_shapes.append(x.shape)
        return apply_fn(x)

    return tracking, w, seen_shapes


def test_results_match_direct_forward():
    apply_fn, w, seen = _model()
    xs = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (23, 8)), np.float32
    )
    with BatchingServer(apply_fn, xs[0], max_batch=8, max_wait_ms=5.0) as srv:
        srv.warmup()
        futs = [srv.submit(x) for x in xs]
        got = np.stack([f.result(timeout=30) for f in futs])
    np.testing.assert_allclose(got, np.asarray(xs @ np.asarray(w)), rtol=1e-5)
    # every launched batch used a static bucket shape
    assert all(s[0] in (1, 2, 4, 8) for s in seen)


def test_concurrent_submitters():
    apply_fn, w, _ = _model()
    rng = np.random.default_rng(2)
    xs = rng.standard_normal((40, 8)).astype(np.float32)
    results = {}
    with BatchingServer(apply_fn, xs[0], max_batch=16, max_wait_ms=2.0) as srv:
        srv.warmup()

        def client(lo, hi):
            for i in range(lo, hi):
                results[i] = srv.submit(xs[i]).result(timeout=30)

        threads = [
            threading.Thread(target=client, args=(i * 10, (i + 1) * 10))
            for i in range(4)
        ]
        [t.start() for t in threads]
        [t.join() for t in threads]
        stats = srv.stats()
    want = xs @ np.asarray(w)
    for i in range(40):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-4, atol=1e-5)
    assert stats["requests"] == 40
    assert stats["p50_ms"] > 0 and stats["batches"] >= 3  # coalesced


def test_shape_mismatch_rejected_and_errors_propagate():
    def bad_apply(x):
        raise RuntimeError("boom")

    srv = BatchingServer(bad_apply, np.zeros(8, np.float32), max_batch=4)
    try:
        with pytest.raises(ValueError, match="request shape"):
            srv.submit(np.zeros(7, np.float32))
        fut = srv.submit(np.zeros(8, np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)
    finally:
        srv.close()


def test_small_bucket_dtype_routing():
    """Buckets <= small_bucket_max go to small_apply_fn (the int8->bf16
    bs=1 routing of VERDICT r3 item 6); larger buckets use apply_fn."""
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    small_shapes, big_shapes = [], []

    @jax.jit
    def fwd(x):
        return x @ w

    def big(x):
        big_shapes.append(x.shape)
        return fwd(x)

    def small(x):
        small_shapes.append(x.shape)
        return fwd(x)

    xs = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (9, 8)), np.float32
    )
    with BatchingServer(
        big, xs[0], max_batch=8, max_wait_ms=5.0,
        small_apply_fn=small, small_bucket_max=2,
    ) as srv:
        srv.warmup()
        # warmup compiled every bucket through its routed fn
        assert {s[0] for s in small_shapes} == {1, 2}
        assert {s[0] for s in big_shapes} == {4, 8}
        small_shapes.clear(), big_shapes.clear()

        # one isolated request -> bucket 1 -> small fn
        got = srv.submit(xs[0]).result(timeout=30)
        np.testing.assert_allclose(got, np.asarray(xs[:1] @ w)[0], rtol=1e-5)
        assert all(s[0] <= 2 for s in small_shapes) and small_shapes
        # a burst -> large bucket -> big fn
        futs = [srv.submit(x) for x in xs[1:]]
        res = np.stack([f.result(timeout=30) for f in futs])
    np.testing.assert_allclose(res, np.asarray(xs[1:] @ w), rtol=1e-5)
    assert any(s[0] >= 4 for s in big_shapes)
