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


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_separable_matches_general_on_axis_aligned_grids(mode, padding_mode):
    """grid_sample_separable (two matmuls) ≡ grid_sample (gather) whenever
    the grid is an outer product of per-axis coordinates — the only grids
    this framework ever builds."""
    from msvit_tpu.ops.grid_sample import grid_sample_separable

    rng = np.random.default_rng(3)
    b, h, w, c = 2, 19, 23, 3
    n, py, px = 4, 5, 6
    img = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    ys = jnp.asarray(rng.uniform(-1.4, 1.4, (b, n, py)), jnp.float32)
    xs = jnp.asarray(rng.uniform(-1.4, 1.4, (b, n, px)), jnp.float32)

    got = grid_sample_separable(img, ys, xs, mode, padding_mode)
    # general path on the outer-product grid, (x, y) order
    grid = jnp.stack(
        jnp.broadcast_arrays(xs[:, :, None, :], ys[:, :, :, None]), axis=-1
    )  # [B,N,Py,Px,2] with (x, y)
    want = grid_sample(img, grid, mode, padding_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_separable_gradients_flow():
    from msvit_tpu.ops.grid_sample import grid_sample_separable

    img = jnp.asarray(np.random.default_rng(0).standard_normal((1, 9, 9, 2)),
                      jnp.float32)
    ys = jnp.asarray([[[-0.5, 0.0, 0.5]]])
    xs = jnp.asarray([[[-0.3, 0.2, 0.7]]])

    def loss(img_, ys_, xs_):
        return jnp.sum(grid_sample_separable(img_, ys_, xs_) ** 2)

    gi, gy, gx = jax.grad(loss, argnums=(0, 1, 2))(img, ys, xs)
    assert float(jnp.abs(gi).sum()) > 0
    assert float(jnp.abs(gy).sum()) > 0
    assert float(jnp.abs(gx).sum()) > 0


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
