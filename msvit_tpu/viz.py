"""Host-side visualization (matplotlib) — qualitative inspection tools,
out of the accelerated path (SURVEY §2.9; rendering stays host-side, but
the t-SNE embedding itself runs on device via `ops/tsne.py`).

* ``visualize_subsample_output`` — nested quadtree rendering: sampled
  patches drawn in their boxes + sigmoid subdivision-decision heat map per
  depth (reference `model/subsample_encoder/visualize.py:15-77`).
* ``visualize_predictive_sample`` — glimpse bounding boxes, predicted
  positions (arrows), predicted-vs-true patch pairs (reference
  `modeling_spvitencoder.py:524-634`).
* ``color`` / ``confidence_ellipse`` — plotting helpers (reference
  `infrastructure/utils.py:510-558`).
* ``visualize_tsne_clusters`` — the spectral-debug t-SNE scatter
  (reference `modeling_spectral.py:289-301`); embedding computed on
  device (`ops/tsne.py`), only the scatter is host matplotlib.
* ``visualize_spectral_debug`` — the full SpectralClustering debug
  figure set (`modeling_spectral.py:98-165,289-316`): label-grid rows
  (HDBSCAN/KMeans/axis-aligned) + per-image t-SNE RGB panels.

matplotlib imports are deferred so the compute path never depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def color(z: float, scale: float = 120.0) -> np.ndarray:
    """Cyclic RGB colormap matching the reference's cluster-id palette
    (`utils.py:510-512`): three phase-shifted sinusoids mapped to [0, 1].
    Implemented here via a single phase vector rather than three calls."""
    k = 2.0 * np.pi * z / scale
    phases = k + (2.0 * np.pi / 3.0) * np.arange(3)
    return 0.5 * (1.0 + np.sin(phases))


def confidence_ellipse(x, y, ax, n_std: float = 1.0, facecolor="none", **kwargs):
    """Covariance confidence ellipse.

    Derived from the standard matplotlib gallery recipe
    ("Plot a confidence ellipse of a two-dimensional dataset"), which is
    also what the reference vendored (`infrastructure/utils.py:515-558`);
    this variant keeps the reference's uncentered second-moment matrix
    (E[xyᵀ], not the covariance of demeaned data) so plots match."""
    from matplotlib import transforms
    from matplotlib.patches import Ellipse

    x, y = np.asarray(x), np.asarray(y)
    if x.size != y.size:
        raise ValueError("x and y must be the same size")
    m = np.stack([x, y], axis=0)
    cov = (m @ m.T) / len(x)
    pearson = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    ellipse = Ellipse(
        (0, 0),
        width=np.sqrt(1 + pearson) * 2,
        height=np.sqrt(1 - pearson) * 2,
        facecolor=facecolor,
        **kwargs,
    )
    transf = (
        transforms.Affine2D()
        .rotate_deg(45)
        .scale(np.sqrt(cov[0, 0]) * n_std, np.sqrt(cov[1, 1]) * n_std)
    )
    ellipse.set_transform(transf + ax.transData)
    return ax.add_patch(ellipse)


def _denormalize(im: np.ndarray, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
    return np.clip(im * np.asarray(std) + np.asarray(mean), 0.0, 1.0)


def visualize_subsample_output(
    outputs: Dict[str, Any],
    tree,
    num_ims: int = 3,
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    show: bool = True,
    save_path: Optional[str] = None,
):
    """Render the nested quadtree (patches in boxes; decision heat map).

    `outputs` is a `SubsampleViTForImageClassification` result with
    output_logs=True and return_pixel_values=True; `tree` the model's
    `QuadTree`.  Corners are in the reference's (y, x) normalized order.
    """
    from matplotlib import pyplot as plt

    logs = outputs["logs"]
    pixels = np.asarray(outputs["pixel_values"], np.float32)  # [B,cap,P,P,C]
    depths = len(logs["valid_masks"])
    corners_all = np.asarray(tree.corners)

    nrows, ncols = 2, depths * num_ims
    fig, axs = plt.subplots(
        nrows=nrows, ncols=ncols, figsize=(2.0 * ncols, 2.0 * nrows),
        squeeze=False,
    )
    for im_idx in range(num_ims):
        for depth in range(depths):
            valid = np.asarray(logs["valid_masks"][depth][im_idx])
            corners = corners_all[valid]
            patches = _denormalize(pixels[im_idx][valid], mean, std)
            logits = np.asarray(logs["subsample_logits"][depth][im_idx])[valid]
            sig = 1.0 / (1.0 + np.exp(-logits))

            ax_im = axs[0, im_idx * depths + depth]
            ax_im.axis("off")
            ax_im.set_aspect("equal")
            for pv, c in zip(patches, corners):
                ax_im.imshow(
                    pv,
                    extent=(c[0, 1], c[1, 1], c[1, 0], c[0, 0]),
                    interpolation="none",
                )
            for c in corners:
                ax_im.plot(
                    [c[0, 1], c[0, 1], c[1, 1], c[1, 1], c[0, 1]],
                    [c[0, 0], c[1, 0], c[1, 0], c[0, 0], c[0, 0]],
                    color="gold",
                    linewidth=2.0 * abs(c[1, 0] - c[0, 0]),
                    linestyle="--",
                )
            ax_im.set_title(f"Image {im_idx}: depth {depth}")

            ax_dt = axs[1, im_idx * depths + depth]
            ax_dt.axis("off")
            ax_dt.set_aspect("equal")
            for s, c in zip(sig, corners):
                ax_dt.imshow(
                    np.asarray(s)[None, None],
                    cmap="seismic",
                    vmin=0.4,
                    vmax=0.6,
                    extent=(c[0, 1], c[1, 1], c[1, 0], c[0, 0]),
                    interpolation="none",
                )
                center = (c[0] + c[1]) / 2
                ax_dt.text(
                    center[1],
                    center[0],
                    f"{float(s):.2f}",
                    fontsize=12.0 * abs(c[1, 0] - c[0, 0]) ** 0.5,
                    ha="center",
                    va="center",
                )
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return fig


def visualize_predictive_sample(
    pixel_values: np.ndarray,  # [B, H, W, C], normalized
    output: Dict[str, Any],
    meta: Dict[str, Any],
    model,
    variables,
    num_ims: int = 3,
    show: bool = True,
    save_path: Optional[str] = None,
):
    """Glimpse bboxes + predicted positions/patches (reference
    `modeling_spvitencoder.py:524-634`)."""
    from matplotlib import pyplot as plt

    def bbox_of(positions):
        return np.asarray(
            model.apply(
                variables,
                positions,
                True,
                method=lambda m, p, b: m.patch_embeddings.grid_sample_points(p, b),
            )
        )  # [..., 2, 2, 2] corner grid, (y, x)

    sample_grid = bbox_of(np.asarray(output["input_position"]))
    have_pred = "predicted_context_position" in meta
    if have_pred:
        pred_grid = bbox_of(np.asarray(meta["predicted_context_position"]))

    fig, axs = plt.subplots(
        1, num_ims, figsize=(4.0 * num_ims, 4.0), squeeze=False
    )
    for i in range(num_ims):
        ax = axs[0, i]
        ax.set_aspect("equal")
        im = np.asarray(pixel_values[i])
        im = (im - im.min()) / max(im.max() - im.min(), 1e-6)
        ax.imshow(im, extent=(-1.0, 1.0, 1.0, -1.0))
        n_ctx = int(output["context_lengths"][i])
        for j in range(n_ctx):
            g = sample_grid[i, j]  # [2,2,2] corners (y,x)
            ys = [g[0, 0, 0], g[0, 1, 0], g[1, 1, 0], g[1, 0, 0], g[0, 0, 0]]
            xs = [g[0, 0, 1], g[0, 1, 1], g[1, 1, 1], g[1, 0, 1], g[0, 0, 1]]
            ax.plot(xs, ys, color="black", linestyle="--", linewidth=1.5)
            if have_pred:
                pg = pred_grid[i, j]
                pys = [pg[0, 0, 0], pg[0, 1, 0], pg[1, 1, 0], pg[1, 0, 0], pg[0, 0, 0]]
                pxs = [pg[0, 0, 1], pg[0, 1, 1], pg[1, 1, 1], pg[1, 0, 1], pg[0, 0, 1]]
                ax.plot(pxs, pys, color="purple", linestyle="--", linewidth=1.5)
        ax.set_title(f"Image {i}")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return fig


def visualize_tsne_clusters(
    features: np.ndarray,  # [n, d] e.g. NCut eigenvectors
    labels: Optional[np.ndarray] = None,  # [n] cluster ids for coloring
    dim: int = 2,
    perplexity: float = 30.0,
    show: bool = True,
    save_path: Optional[str] = None,
):
    """t-SNE scatter of clustering features, colored by cluster id —
    the reference's spectral-debug inspection plot
    (`modeling_spectral.py:289-301`), with the embedding itself computed
    on device by `ops.tsne` (exact t-SNE; sklearn only rendered here)."""
    from matplotlib import pyplot as plt

    from msvit_tpu.ops.tsne import tsne

    y, _ = tsne(np.asarray(features, np.float32), dim=dim, perplexity=perplexity)
    y = np.asarray(y)
    if labels is None:
        cs = None
    else:
        cs = np.stack([color(float(l)) for l in np.asarray(labels)])
    fig = plt.figure(figsize=(5.0, 5.0))
    if dim == 3:
        ax = fig.add_subplot(projection="3d")
        ax.scatter(y[:, 0], y[:, 1], y[:, 2], c=cs, s=8)
    else:
        ax = fig.add_subplot()
        ax.set_aspect("equal")
        ax.scatter(y[:, 0], y[:, 1], c=cs, s=8)
    ax.set_title("t-SNE of clustering features")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    if show:
        plt.show()
    plt.close(fig)
    return fig


def visualize_spectral_debug(
    ncut_x: np.ndarray,  # [bsz, N, ncut_dim] NCut eigenvectors
    grid,  # (h, w) patch grid, h*w == N
    key=None,
    images: int = 3,
    cluster_size_threshold: float = 0.02,
    min_samples: int = 512,
    tsne_iters: int = 500,
    show: bool = True,
    save_prefix: Optional[str] = None,
):
    """The reference SpectralClustering `visualize` debug figures
    (`modeling_spectral.py:98-165` label grids and `:289-316` t-SNE
    scatters), composed from the device ops:

    * one figure of per-labelling patch-grid rows — HDBSCAN / centroid
      / seeded-KMeans / axis-aligned assignments from
      `spectral_debug_labels`, first ``images`` images side by side,
      colored by the cluster palette (noise = gray);
    * per image (first ``images``): the eigenvector heat-map strip
      (`:98-106` — each NCut dimension painted on the patch grid, "bwr")
      and the t-SNE panel — 2-D embedding scattered with the
      min-max-normalized 3-D embedding as RGB, plus that RGB painted
      onto the patch grid (both t-SNEs on device).

    Returns ``(figs, labels)`` — the matplotlib figures and the label
    OrderedDict.  Deviation: cluster colors use our cyclic palette
    (`color`), not matplotlib's prop cycle.
    """
    import jax
    import jax.numpy as jnp
    from matplotlib import pyplot as plt

    from msvit_tpu.models.clustering import spectral_debug_labels
    from msvit_tpu.ops.tsne import tsne

    ncut_x = np.asarray(ncut_x, np.float32)
    bsz, n_tok, ncut_dim = ncut_x.shape
    h, w = grid
    if h * w != n_tok:
        raise ValueError(f"grid {grid} does not tile N={n_tok}")
    if key is None:
        key = jax.random.PRNGKey(0)
    images = min(images, bsz)
    figs = []

    # eigenvector heat-maps: one row per image, columns = NCut dims
    fig, axs = plt.subplots(
        nrows=images,
        ncols=ncut_dim,
        figsize=(1.6 * ncut_dim, 1.6 * images),
        squeeze=False,
    )
    vmax = np.abs(ncut_x[:images]).max() + 1e-8
    for i in range(images):
        for j in range(ncut_dim):
            axs[i, j].imshow(
                ncut_x[i, :, j].reshape(h, w), cmap="bwr", vmin=-vmax, vmax=vmax
            )
            axs[i, j].axis("off")
            if i == 0:
                axs[i, j].set_title(f"eig {j}", fontsize=8)
    fig.tight_layout()
    if save_prefix:
        fig.savefig(f"{save_prefix}_eigs.png", bbox_inches="tight")
    figs.append(fig)

    labels = spectral_debug_labels(
        jnp.asarray(ncut_x.reshape(bsz * n_tok, -1)),
        key,
        cluster_size_threshold=cluster_size_threshold,
        min_samples=min_samples,
    )
    fig, axs = plt.subplots(
        nrows=len(labels), ncols=1, figsize=(2.5 * images, 2.5 * len(labels))
    )
    axs = np.atleast_1d(axs)
    for ax, (name, lab) in zip(axs, labels.items()):
        cluster_im = np.full((bsz * n_tok, 3), 0.5, np.float32)  # noise gray
        for cid in range(int(lab.max()) + 1):
            cluster_im[lab == cid] = color(float(cid))
        tiles = cluster_im.reshape(bsz, h, w, 3)[:images]
        ax.imshow(np.concatenate(list(tiles), axis=1))
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    if save_prefix:
        fig.savefig(f"{save_prefix}_labels.png", bbox_inches="tight")
    figs.append(fig)

    for i in range(images):
        xi = jnp.asarray(ncut_x[i])
        y2, _ = tsne(xi, dim=2, n_iter=tsne_iters)
        y3, _ = tsne(xi, dim=3, n_iter=tsne_iters)
        y2, y3 = np.asarray(y2), np.asarray(y3)
        c = (y3 - y3.min(axis=0)) / (np.ptp(y3, axis=0) + 1e-8)
        fig, (ax_s, ax_im) = plt.subplots(ncols=2, figsize=(8.0, 4.0))
        ax_s.scatter(y2[:, 0], y2[:, 1], c=c, s=16)
        ax_s.set_title(f"Image {i}")
        ax_s.set_aspect("equal")
        ax_im.imshow(c.reshape(h, w, 3))
        ax_im.axis("off")
        if save_prefix:
            fig.savefig(f"{save_prefix}_tsne{i}.png", bbox_inches="tight")
        figs.append(fig)

    if show:
        plt.show()
    for f in figs:
        plt.close(f)
    return figs, labels
