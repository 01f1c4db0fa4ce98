"""msvit_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of the multi-state-ViT reference.

The package provides five Vision-Transformer encoder families (base,
multistate, predictive, saccadic, subsample), a clustering module
(spectral NCut / FPS), TPU kernels for the hot ops (fused masked flash
attention, bicubic glimpse sampling, segment-sum KMeans/NCut), and the
surrounding framework: typed configs, mesh/sharding parallelism, data
pipeline, optimization loops, checkpointing, and HF-checkpoint import.

Layout:
    msvit_tpu.models    encoder zoo (base / multistate / predictive /
                        saccadic / subsample / clustering)
    msvit_tpu.ops       TPU compute kernels (attention, grid_sample,
                        ncut, kmeans, fps)
    msvit_tpu.parallel  mesh construction, shardings, pjit train steps
    msvit_tpu.data      dataset registry + image pipeline
    msvit_tpu.train     optimizers, losses, checkpointing
    msvit_tpu.compat    PyTorch/HF checkpoint import
    msvit_tpu.serve     dynamic micro-batching inference server
    msvit_tpu.export    AOT export (jax.export artifacts, AOT compile)
    msvit_tpu.eval      jitted top-k accuracy / loss evaluation loop
    msvit_tpu.zoo       named configs (trunk scales + reference sandbox setups)
    msvit_tpu.utils     math / pytree / misc helpers

Unlike the reference (`/root/reference/infrastructure/settings.py:6-15`),
importing this package has **no side effects**: no global device or dtype
is set, no chdir, no sys.path mutation.  Device placement is controlled by
`jax.sharding`; dtypes are per-module config fields.
"""

__version__ = "0.1.0"
