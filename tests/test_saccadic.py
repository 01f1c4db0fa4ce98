"""Saccadic encoder tests (SURVEY §4): Gaussian log-pdf vs a dense golden,
beam-search matcher invariants (the sandbox/associative.py smoke test,
upgraded to assertions), quadratic attention vs a naive computation,
refiner shapes/masks, and the full serial controller."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.models.saccadic import (
    SaccadicViTConfig,
    SaccadicViTEmbeddings,
    SaccadicViTModel,
    SaccadicViTMultiStatePattern,
    TransformerSaccadicViTPredictor,
    gaussian_low_rank_log_pdf,
)
from msvit_tpu.models.saccadic.pattern import WILDCARD
from msvit_tpu.settings import parity_policy


def _cfg(**kw):
    base = dict(
        hidden_size=16,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_patterns=((1, 5), (2, 6)),
        covariance_dim=4,
        log_covariance_shift=0.0,
        beam_size=8,
        image_size=64,
        patch_size=16,
        patch_config="translation",
        pe_bias=True,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    base.update(kw)
    return SaccadicViTConfig(**base)


def test_log_pdf_matches_dense_gaussian():
    """log N(x; μ, shift·I + A Aᵀ) via the SVD route (reference
    `modeling_predictor.py:128-146`) ≡ the dense multivariate normal."""
    rng = np.random.default_rng(0)
    d_model, d = 6, 2
    log_shift = 0.3
    x = rng.standard_normal((1, 3, d_model)).astype(np.float32)  # [B,M,D]
    mean = rng.standard_normal((1, 1, 2, d_model)).astype(np.float32)
    a = rng.standard_normal((1, 1, 2, d_model, d)).astype(np.float32)

    got, _, _, _ = gaussian_low_rank_log_pdf(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(a), jnp.asarray(log_shift)
    )  # [1,1,2,3]

    shift = np.exp(log_shift)
    for r in range(2):
        cov = shift * np.eye(d_model) + a[0, 0, r] @ a[0, 0, r].T
        inv = np.linalg.inv(cov)
        _, logdet = np.linalg.slogdet(cov)
        for m in range(3):
            diff = x[0, m] - mean[0, 0, r]
            want = -0.5 * (
                d_model * np.log(2 * np.pi) + logdet + diff @ inv @ diff
            )
            np.testing.assert_allclose(
                float(got[0, 0, r, m]), want, rtol=1e-4, atol=1e-4
            )


def test_match_invariants():
    """The associative.py smoke test with assertions: shapes, wildcard
    counts, sorted joint pdfs, ≥1 hidden-node binding per match."""
    cfg = _cfg()
    model = SaccadicViTMultiStatePattern(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    variables = model.init(jax.random.PRNGKey(2), h, c, 1)
    out = model.apply(variables, h, c, 1)

    # groups: (1,0), (2,1), (2,0)
    assert set(out.keys()) == {(1, 0), (2, 1), (2, 0)}
    for (k, n_wild), p in out.items():
        w = p["pattern_index"].shape[1]
        assert p["node_indices"].shape == (2, w, k)
        assert p["conditional_mean"].shape == (2, w, n_wild, 16)
        assert p["conditional_covariance"].shape == (2, w, n_wild, 16, 4)
        nodes = np.asarray(p["node_indices"])
        # exactly n_wild wildcards per entry
        assert ((nodes == WILDCARD).sum(axis=-1) == n_wild).all()
        # bound indices are valid positions in [hidden ++ context]
        bound = nodes[nodes != WILDCARD]
        assert bound.min() >= 0 and bound.max() < 3 + 4
        # first binding searched hidden only → ≥1 node index < N
        assert ((nodes < 3) & (nodes != WILDCARD)).any(axis=-1).all()
        # joint log pdfs finite and sorted descending (lax.top_k order)
        joint = np.asarray(p["joint_log_pdf"])
        assert np.isfinite(joint).all()
        assert (np.diff(joint, axis=-1) <= 1e-4).all()


def test_conditioning_shrinks_uncertainty():
    """Binding a node must not increase the remaining slots' covariance
    spectrum (H has singular values ≤ 1)."""
    cfg = _cfg(num_patterns=((2, 4),), beam_size=4)
    model = SaccadicViTMultiStatePattern(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16))
    variables = model.init(jax.random.PRNGKey(2), h, c, 1)
    out = model.apply(variables, h, c, 1)
    p = out[(2, 1)]
    # compare conditioned covariance norm to the original pattern's
    stds = variables["params"]["std_2"]  # [P, 2, D, d]
    pat = np.asarray(p["pattern_index"][0])
    cond = np.asarray(p["conditional_covariance"][0])  # [W, 1, D, d]
    for w in range(cond.shape[0]):
        orig_norms = np.linalg.norm(np.asarray(stds[pat[w]]), axis=(-2, -1))
        got = np.linalg.norm(cond[w, 0])
        assert got <= orig_norms.max() + 1e-4


def test_quadratic_attention_matches_naive():
    from msvit_tpu.models.saccadic.refiner import QuadraticSelfAttention

    cfg = _cfg()
    attn = QuadraticSelfAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16))
    variables = attn.init(jax.random.PRNGKey(1), x)
    got = attn.apply(variables, x)

    p = variables["params"]
    h, dh = 4, 4

    def heads(v):
        return np.asarray(v).reshape(1, 5, h, dh).transpose(0, 2, 1, 3)

    xn = np.asarray(x)
    q = heads(xn @ np.asarray(p["query"]["kernel"]) + np.asarray(p["query"]["bias"]))
    k = heads(xn @ np.asarray(p["key"]["kernel"]) + np.asarray(p["key"]["bias"]))
    v = heads(xn @ np.asarray(p["value"]["kernel"]) + np.asarray(p["value"]["bias"]))
    dq = heads(xn @ np.asarray(p["distance"]["kernel"]))
    scores = np.zeros((1, h, 5, 5))
    for i in range(5):
        for j in range(5):
            for hh in range(h):
                quad = -0.5 * np.sum((dq[0, hh, i] - dq[0, hh, j]) ** 2)
                lin = q[0, hh, i] @ k[0, hh, j]
                scores[0, hh, i, j] = (quad + lin) / np.sqrt(dh)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = (
        np.einsum("bhqk,bhkd->bhqd", probs, v)
        .transpose(0, 2, 1, 3)
        .reshape(1, 5, 16)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_predictor_refiner():
    cfg = _cfg()
    pattern = SaccadicViTMultiStatePattern(cfg)
    h = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    pvars = pattern.init(jax.random.PRNGKey(2), h, c, 1)
    patterns = pattern.apply(pvars, h, c, 1)

    predictor = TransformerSaccadicViTPredictor(cfg)
    rvars = predictor.init(jax.random.PRNGKey(3), h, c, patterns)
    enc_h, enc_p = predictor.apply(rvars, h, c, patterns)
    assert enc_h.shape == (2, 3, 16)
    assert set(enc_p.keys()) == set(patterns.keys())
    for key, tok in enc_p.items():
        assert tok.shape == (2, patterns[key]["pattern_index"].shape[1], 16)

    # prediction methods
    ms = predictor.apply(
        rvars,
        patterns[(2, 1)],
        jnp.asarray(0.0),
        "max",
        method=TransformerSaccadicViTPredictor.predicted_states,
    )
    assert ms.shape == patterns[(2, 1)]["conditional_mean"].shape
    mm = predictor.apply(
        rvars,
        patterns[(2, 1)],
        jnp.asarray(0.0),
        "mean",
        jax.random.PRNGKey(9),
        method=TransformerSaccadicViTPredictor.predicted_states,
    )
    assert bool(jnp.isfinite(mm).all())


def test_saccadic_controller_end_to_end():
    cfg = _cfg()
    model = SaccadicViTModel(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), pix)
    out = model.forward(
        variables,
        pix,
        max_trace_length=6,
        max_saccade_length=3,
        absolute_threshold=0.05,
    )
    assert out["num_steps"] >= 1
    assert "query" in out["trace"]
    assert out["trace"]["query"].shape[-1] == cfg.dof
    assert np.isfinite(out["trace"]["embedding"]).all()


def test_embeddings_glimpse():
    cfg = _cfg()
    emb = SaccadicViTEmbeddings(cfg)
    pix = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    q = jnp.zeros((2, cfg.dof))
    variables = emb.init(jax.random.PRNGKey(1), pix, q)
    out = emb.apply(variables, pix, q)
    assert out.shape == (2, 16)
    dec = emb.apply(
        variables, out, method=SaccadicViTEmbeddings.decode_position
    )
    assert dec.shape == (2, cfg.dof)


def test_chol_solver_matches_eigh():
    """Cholesky–Woodbury matcher ≡ Gram-eigh matcher (pattern.py): same
    log-pdfs, same beam selections, same conditional means; the conditional
    covariance factors differ by a rotation, so they are compared through
    their Gram — the only form any consumer sees."""
    from msvit_tpu.models.saccadic.pattern import (
        gaussian_low_rank_log_pdf_chol,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 12)).astype(np.float32))
    mean = jnp.asarray(rng.standard_normal((2, 3, 2, 12)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((2, 3, 2, 12, 4)).astype(np.float32))
    shift = jnp.asarray(0.4)

    pdf_e, _, log_l, v = gaussian_low_rank_log_pdf(x, mean, a, shift)
    pdf_c, _, h = gaussian_low_rank_log_pdf_chol(x, mean, a, shift)
    np.testing.assert_allclose(pdf_e, pdf_c, rtol=2e-4, atol=2e-4)
    # h hᵀ must equal (I+G)⁻¹ in both parameterizations
    from msvit_tpu.models.saccadic.pattern import _datan_exp_h

    h_e = v * _datan_exp_h(log_l)[..., None, :]
    np.testing.assert_allclose(
        h_e @ jnp.swapaxes(h_e, -1, -2),
        h @ jnp.swapaxes(h, -1, -2),
        rtol=2e-4,
        atol=2e-4,
    )

    cfg_e = _cfg(matcher_solver="eigh")
    cfg_c = _cfg(matcher_solver="chol")
    model_e = SaccadicViTMultiStatePattern(cfg_e)
    model_c = SaccadicViTMultiStatePattern(cfg_c)
    hs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    cs = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    variables = model_e.init(jax.random.PRNGKey(2), hs, cs, 1)
    out_e = model_e.apply(variables, hs, cs, 1)
    out_c = model_c.apply(variables, hs, cs, 1)
    assert out_e.keys() == out_c.keys()
    for key in out_e:
        pe, pc = out_e[key], out_c[key]
        np.testing.assert_array_equal(
            pe["pattern_index"], pc["pattern_index"]
        )
        np.testing.assert_array_equal(
            pe["node_indices"], pc["node_indices"]
        )
        np.testing.assert_allclose(
            pe["joint_log_pdf"], pc["joint_log_pdf"], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            pe["conditional_mean"],
            pc["conditional_mean"],
            rtol=1e-3,
            atol=1e-3,
        )
        cov_e = pe["conditional_covariance"]
        cov_c = pc["conditional_covariance"]
        np.testing.assert_allclose(
            cov_e @ jnp.swapaxes(cov_e, -1, -2),
            cov_c @ jnp.swapaxes(cov_c, -1, -2),
            rtol=1e-3,
            atol=1e-3,
        )
