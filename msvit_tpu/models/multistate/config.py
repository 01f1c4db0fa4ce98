"""Multistate config (reference `configuration_msvit.py:10-43`)."""

from __future__ import annotations

import dataclasses

from msvit_tpu.models.base.config import BaseViTConfig
from msvit_tpu.models.clustering import ClusteringConfig, SpectralClusteringConfig


@dataclasses.dataclass(frozen=True)
class MultiStateViTConfig(BaseViTConfig):
    # layers before the first clustering event
    pregeneration_period: int = 4
    # layers between re-clusterings
    generation_period: int = 2
    # soft mask penalty: scores − inf·(1 − mask)
    # (reference `modeling_msvitencoder.py:146`)
    attention_mask_inf: float = 1e2
    clustering: ClusteringConfig = SpectralClusteringConfig()
    # Cluster-banded attention (ops/banded_attention.py): keep tokens
    # sorted by cluster id and skip fully-masked key blocks instead of
    # computing the dense [S,S] soft-masked scores.  Deviation: masked
    # token-row contributions are dropped rather than e^{-inf}-attenuated
    # (≤1e-30 relative).  Ignored when per-layer attention probabilities
    # are requested; the last layer stays dense (it emits the pooled
    # RX→TX attentions).
    banded_attention: bool = False

    @property
    def max_clusters(self) -> int:
        """Static padded cluster-axis size (replaces the reference's
        dynamic `max_n_clusters`, `modeling_msvitencoder.py:428-429`)."""
        return self.clustering.max_clusters
