"""Coverage for remaining utils: Hadamard conjugation series vs brute
force, pytree stacking + vmap, model_size, hash_config, arrays helpers,
predictive visualizer smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from msvit_tpu.utils import (
    hadamard_conjugation,
    hadamard_conjugation_diff_order1,
    hadamard_conjugation_diff_order2,
    hash_config,
    model_size,
    stack_pytrees,
)
from msvit_tpu.utils.arrays import (
    PTR,
    array_of,
    call_func_with_kwargs,
    multi_enumerate,
    multi_map,
    nested_type,
    print_disabled,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0.1, 0.5, shape), jnp.float32
    )


def test_hadamard_conjugation_matches_bruteforce():
    m, n, p_, q_ = 2, 3, 2, 2
    a, alpha = _rand((m, n), 0), _rand((m, n), 1)
    b, beta = _rand((p_, q_), 2), _rand((p_, q_), 3)
    c = _rand((m, p_), 4)
    got = np.asarray(hadamard_conjugation(a, b, alpha, beta, c))
    want = np.zeros((n, q_))
    for i in range(m):
        for j in range(p_):
            for k in range(n):
                for l in range(q_):
                    want[k, l] += (
                        float(a[i, k]) * float(b[j, l]) * float(c[i, j])
                        / (1 - float(alpha[i, k]) * float(beta[j, l]))
                    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hadamard_diff_orders_finite():
    m, n, p_, q_ = 2, 3, 2, 2
    a, alpha = _rand((m, n), 0), _rand((m, n), 1)
    b = _rand((p_, q_), 2)
    b1, b2 = _rand((p_, q_), 3), _rand((p_, q_), 5)
    c1 = _rand((m, p_), 4)
    out1 = hadamard_conjugation_diff_order1(a, b, alpha, b1, b2, c1)
    assert out1.shape == (n, q_) and bool(jnp.isfinite(out1).all())
    c2 = _rand((p_, p_), 6)
    out2 = hadamard_conjugation_diff_order2(b, b1, b2, c2)
    assert out2.shape == (q_, q_) and bool(jnp.isfinite(out2).all())


def test_stack_pytrees_and_vmap():
    """stack_pytrees + jax.vmap subsumes the reference's
    stack_module_arr/run_module_arr (`utils.py:39-110`)."""
    trees = [
        {"w": jnp.full((3,), float(i)), "b": jnp.asarray(float(i))}
        for i in range(4)
    ]
    stacked = stack_pytrees(trees)
    assert stacked["w"].shape == (4, 3)

    def apply(params, x):
        return params["w"] @ x + params["b"]

    out = jax.vmap(apply, in_axes=(0, None))(stacked, jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(out), [0.0, 4.0, 8.0, 12.0])


def test_model_size_and_hash():
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert model_size(params) == 17
    h1 = hash_config({"x": 1, "y": [1, 2]})
    h2 = hash_config({"y": [1, 2], "x": 1})
    assert h1 == h2  # order-insensitive
    assert h1 != hash_config({"x": 2, "y": [1, 2]})


def test_arrays_helpers():
    arr = np.empty((2, 2), object)
    for i in range(2):
        for j in range(2):
            arr[i, j] = (i, j)
    items = dict(multi_enumerate(arr))
    assert items[(1, 0)] == (1, 0)
    doubled = multi_map(lambda t: t[0] + t[1], arr, dtype=int)
    assert doubled[1, 1] == 2
    assert list(PTR(42)) == [42]
    assert array_of({"k": 1}).shape == ()
    assert nested_type({"a": [1, "s"]}) == {"a": [int, str]}
    with print_disabled():
        print("this is suppressed")
    # kwargs that the callee rejects get dropped
    assert call_func_with_kwargs(lambda x: x, (5,), {"bogus": 1}) == 5
    assert call_func_with_kwargs(lambda x, **kw: kw.get("bogus"), (5,), {"bogus": 7}) == 7


def test_predictive_visualizer_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from msvit_tpu.models.predictive import (
        PredictiveViTConfig,
        PredictiveViTModel,
        PredictiveViTTrainingConfig,
        training_loss,
    )
    from msvit_tpu.settings import parity_policy
    from msvit_tpu.viz import visualize_predictive_sample

    cfg = PredictiveViTConfig(
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        image_size=64,
        patch_size=16,
        patch_config="scaling",
        use_cls_token=False,
        max_context_length=3,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = PredictiveViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "glimpse": jax.random.PRNGKey(2)}, pix
    )
    out = model.apply(
        variables, pix, rngs={"glimpse": jax.random.PRNGKey(3)}, output_inputs=True
    )
    _, _, meta = training_loss(
        model, variables, pix, out,
        PredictiveViTTrainingConfig(context_prediction=1.0, query_prediction=1.0),
    )
    path = str(tmp_path / "glimpses.png")
    visualize_predictive_sample(
        np.asarray(pix), out, meta, model, variables,
        num_ims=3, show=False, save_path=path,
    )
    import os

    assert os.path.getsize(path) > 0


def test_zoo_configs_build_and_override():
    """Every zoo entry builds; overrides replace fields; unknown names
    and fields fail loudly; trunk geometries match the published scales."""
    import dataclasses

    import pytest

    from msvit_tpu.zoo import build_config, zoo_names

    for name in zoo_names():
        cfg = build_config(name)
        assert dataclasses.is_dataclass(cfg)
        assert cfg.hidden_size % cfg.num_attention_heads == 0

    b = build_config("vit-b16")
    assert (b.hidden_size, b.num_hidden_layers, b.patch_size) == (768, 12, 16)
    l = build_config("vit-l16")
    assert (l.hidden_size, l.num_hidden_layers) == (1024, 24)
    g = build_config("dinov2-vitg14")
    assert g.use_swiglu_ffn and g.layerscale_value == 1e-5
    assert build_config("dino-vitb8").patch_size == 8
    ms = build_config("multistate-sandbox")
    assert ms.patch_size == 8 and ms.max_clusters == 16
    sac = build_config("saccadic-reference")
    assert dict(sac.num_patterns) == {1: 1024, 2: 1024}
    assert sac.beam_size == 64 and sac.covariance_dim == 64

    r = build_config("vit-b16", remat=True)
    assert r.remat and not b.remat
    with pytest.raises(KeyError):
        build_config("vit-xxl")
    with pytest.raises(TypeError):
        build_config("vit-b16", not_a_field=1)
