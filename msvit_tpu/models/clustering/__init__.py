"""Token-clustering module — plugin registry used by the multistate
encoder (reference `model/clustering/`, SURVEY §2.4).

All variants share the interface

    cluster(config, parent_indices [B,N], x [B,N,D], key)
        -> (child_indices [B,N] int32, n_children [max_clusters] int32)

where child ids are **global across the batch** (the reference's spectral
module pools tokens from every batch element per parent cluster,
`modeling_spectral.py:85-90`) and contiguous in parent order, so
`parent_of(child) = searchsorted(cumsum(n_children), child, 'right')` —
the mapping the multistate backbone uses to duplicate TX/RX tokens
(`modeling_msvitencoder.py:494-502`).
"""

from msvit_tpu.models.clustering.module import (  # noqa: F401
    CLUSTERING_CLASSES,
    AxisAlignClusteringConfig,
    ClusteringConfig,
    FPSClusteringConfig,
    SpectralClusteringConfig,
    axis_align_cluster,
    cluster,
    fps_cluster,
    max_children_bound,
    spectral_cluster,
    spectral_debug_labels,
)
