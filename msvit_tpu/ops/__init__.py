"""TPU compute kernels for the hot ops.

* attention   — masked multi-head attention: XLA reference path + fused
                Pallas flash kernel (replaces torch SDPA,
                reference `modeling_base.py:144-152`).
* grid_sample — batched affine-glimpse bicubic/bilinear sampler
                (replaces `F.grid_sample`, reference
                `modeling_spvitencoder.py:286-289` et al.).
* ncut        — batched Nyström normalized-cuts embedding
                (replaces `ncut_pytorch.NCUT`); `kway_ncut` Yu–Shi
                discretization (replaces `ncut_pytorch.kway_ncut`).
* kmeans      — fixed-iteration segment-sum KMeans (replaces cuML KMeans).
* fps         — farthest point sampling (replaces the reference's missing
                `utils.fps` / torch_fpsample).
* hdbscan     — HDBSCAN for the debug clustering paths (replaces cuML
                HDBSCAN in HDBNCUT / `visualize`,
                `modeling_spectral.py:24-39,96-130`): device MR-graph MST,
                host condensed-tree extraction.
* tsne        — exact on-device t-SNE (replaces sklearn TSNE in the
                spectral debug paths, `modeling_spectral.py:291-292`):
                matmul distances, lock-step perplexity bisection,
                lax.scan KL descent.
"""

from msvit_tpu.ops.attention import multi_head_attention  # noqa: F401
