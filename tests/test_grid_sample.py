"""Glimpse sampler vs torch `F.grid_sample` goldens (SURVEY §4 (a))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msvit_tpu.ops.grid_sample import grid_sample


def _torch_golden(img_nchw, grid_xy, mode, padding_mode):
    import torch
    import torch.nn.functional as F

    out = F.grid_sample(
        torch.from_numpy(img_nchw),
        torch.from_numpy(grid_xy),
        mode=mode,
        padding_mode=padding_mode,
        align_corners=False,
    )
    return out.numpy()


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_matches_torch(mode, padding_mode):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 13, 17, 3
    gh, gw = 5, 7
    img = rng.standard_normal((b, h, w, c), dtype=np.float32)
    # include points well outside [-1,1] to exercise padding
    grid = rng.uniform(-1.6, 1.6, (b, gh, gw, 2)).astype(np.float32)

    want = _torch_golden(
        img.transpose(0, 3, 1, 2), grid, mode, padding_mode
    )  # [B,C,gh,gw]
    got = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode, padding_mode)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    atol = 2e-5 if mode != "nearest" else 0.0
    np.testing.assert_allclose(got, want, atol=atol)


def test_arbitrary_sample_shape():
    img = jnp.ones((2, 8, 8, 3))
    grid = jnp.zeros((2, 4, 5, 6, 2))  # [B, N, P, P, 2]
    out = grid_sample(img, grid)
    assert out.shape == (2, 4, 5, 6, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_gradients_wrt_image_and_grid():
    """Losses backprop into sampled positions (reference
    `modeling_training.py:130-146`) — grads must exist and match torch."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 9, 9, 2), dtype=np.float32)
    grid = rng.uniform(-0.8, 0.8, (1, 3, 3, 2)).astype(np.float32)

    def loss_jax(img_, grid_):
        return jnp.sum(grid_sample(img_, grid_, "bicubic", "border") ** 2)

    gi, gg = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2)).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    t_out = F.grid_sample(
        t_img, t_grid, mode="bicubic", padding_mode="border", align_corners=False
    )
    (t_out**2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gi).transpose(0, 3, 1, 2), t_img.grad.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(gg), t_grid.grad.numpy(), atol=1e-3)
