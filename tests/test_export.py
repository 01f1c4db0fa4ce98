"""AOT export roundtrip (msvit_tpu/export.py): serialize the jitted
forward, reload from bytes, and match the live model exactly.  No
reference counterpart (the reference has no deployment story) — this is
part of the serving stack (SURVEY §2.10 TPU plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.export import aot_compile, export_forward, load_forward
from msvit_tpu.models.base import BaseViTConfig
from msvit_tpu.models.base.vit import ViTModel
from msvit_tpu.settings import parity_policy


def _tiny():
    cfg = BaseViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        policy=parity_policy(),
        attn_implementation="xla",
    )
    model = ViTModel(cfg)
    rng = jax.random.PRNGKey(0)
    pix = jax.random.normal(rng, (2, 32, 32, 3), dtype=jnp.float32)
    params = model.init({"params": rng}, pix)

    def fwd(p, x):
        return model.apply(p, x)["last_hidden_state"]

    return fwd, params, pix


def test_export_roundtrip_matches_live_model(tmp_path):
    fwd, params, pix = _tiny()

    want = np.asarray(fwd(params, pix))

    art = export_forward(fwd, (params, pix))
    assert isinstance(art, bytes) and len(art) > 0

    # survive a file roundtrip (the registry / fleet-distribution shape)
    f = tmp_path / "vit.msvx"
    f.write_bytes(art)
    g = load_forward(f.read_bytes())
    got = np.asarray(g(params, pix))
    np.testing.assert_array_equal(got, want)


def test_export_bundled_params(tmp_path):
    fwd, params, pix = _tiny()

    want = np.asarray(fwd(params, pix))
    art = export_forward(fwd, (params, pix), bundle_params=True)
    g = load_forward(art)
    got = np.asarray(g(pix))  # params frozen inside
    np.testing.assert_array_equal(got, want)


def test_aot_compile_and_cost_analysis():
    fwd, params, pix = _tiny()

    compiled, cost = aot_compile(fwd, (params, pix))
    got = np.asarray(compiled(params, pix))
    np.testing.assert_array_equal(got, np.asarray(fwd(params, pix)))
    assert isinstance(cost, dict)


def test_export_polymorphic_batch(tmp_path):
    """One artifact, symbolic batch axis: serves any batch size and
    matches the live model at each."""
    fwd, params, pix = _tiny()
    art = export_forward(fwd, (params, pix), polymorphic_batch=True)
    g = load_forward(art)
    for b in (1, 2, 5):
        x = jnp.tile(pix[:1], (b, 1, 1, 1)) + jnp.arange(b).reshape(
            b, 1, 1, 1
        ) * 0.01
        np.testing.assert_allclose(
            np.asarray(g(params, x)),
            np.asarray(fwd(params, x)),
            rtol=1e-6,
            atol=1e-6,
        )
