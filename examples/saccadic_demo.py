"""Saccadic demo — the `sandbox/saccadic.py` + `sandbox/associative.py` /
`sandbox/centers.py` workflows: smoke the glimpse tokenizer, the pattern
beam matcher on random features (the associative.py test,
reference `:64-85`), and the full serial saccade controller.

    python examples/saccadic_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from msvit_tpu.models.saccadic import (
        SaccadicViTConfig,
        SaccadicViTEmbeddings,
        SaccadicViTModel,
        SaccadicViTMultiStatePattern,
    )

    cfg = SaccadicViTConfig(
        hidden_size=768,
        num_hidden_layers=4,
        num_attention_heads=12,
        num_patterns=((1, 64), (2, 64)),
        covariance_dim=64,
        beam_size=64,
        image_size=448,
        patch_size=128,
        patch_config="translation",
    )
    rng = jax.random.PRNGKey(1212)
    pix = jax.random.normal(rng, (1, 448, 448, 3))

    # 1. glimpse tokenizer smoke (sandbox/saccadic.py:53-57)
    emb = SaccadicViTEmbeddings(cfg)
    q = jnp.zeros((1, cfg.dof))
    ev = emb.init(jax.random.PRNGKey(0), pix, q)
    e = emb.apply(ev, pix, q)
    print("glimpse embedding:", e.shape)

    # 2. pattern match smoke on random features (sandbox/associative.py:64-85)
    pattern = SaccadicViTMultiStatePattern(cfg)
    h = jax.random.normal(jax.random.PRNGKey(1), (1, 4, cfg.hidden_size))
    c = jax.random.normal(jax.random.PRNGKey(2), (1, 6, cfg.hidden_size))
    pv = pattern.init(jax.random.PRNGKey(3), h, c, 1)
    match = pattern.apply(pv, h, c, 1)
    for (k, n_wild), p in match.items():
        print(
            f"complexity {k}, wildcards {n_wild}: beam {p['pattern_index'].shape[1]}, "
            f"best joint log-pdf {float(p['joint_log_pdf'][0, 0]):.2f}"
        )

    # 3. serial saccade controller (design.txt semantics)
    model = SaccadicViTModel(cfg)
    variables = model.init(jax.random.PRNGKey(4), pix)
    out = model.forward(
        variables, pix, max_trace_length=8, max_saccade_length=4
    )
    print("controller steps:", out["num_steps"])
    print("trace queries:", out["trace"]["query"].shape)
    print("terminal indices:", out["terminal_indices"])
    print("constructed edges:", len(out["constructed_edges"]))


if __name__ == "__main__":
    main()
