"""NCut rbf-vs-cosine comparison — the `sandbox/ncut_euclidean.py`
workflow (reference `:12-30`): embed the same features under both
affinities and compare spectra / embeddings.

    python examples/ncut_compare.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from msvit_tpu.ops.ncut import ncut


def main():
    rng = np.random.default_rng(1212)
    # three separated blobs
    x = np.concatenate(
        [rng.standard_normal((100, 16)) + 6 * i for i in range(3)]
    ).astype(np.float32)
    x = jnp.asarray(x)

    key = jax.random.PRNGKey(0)
    v_rbf, e_rbf = ncut(x, num_eig=6, key=key, num_sample=256, distance="rbf")
    v_cos, e_cos = ncut(x, num_eig=6, key=key, num_sample=256, distance="cosine")

    print("rbf    eigenvalues:", np.round(np.asarray(e_rbf), 4))
    print("cosine eigenvalues:", np.round(np.asarray(e_cos), 4))

    # blob separation: mean within-blob vs cross-blob embedding distance
    for name, v in (("rbf", v_rbf), ("cosine", v_cos)):
        v = np.asarray(v)
        within = np.mean(
            [np.std(v[i * 100 : (i + 1) * 100], axis=0).mean() for i in range(3)]
        )
        centers = np.stack(
            [v[i * 100 : (i + 1) * 100].mean(axis=0) for i in range(3)]
        )
        cross = np.linalg.norm(
            centers[:, None] - centers[None, :], axis=-1
        ).max()
        print(f"{name}: within-blob spread {within:.4f}, max center gap {cross:.4f}")


if __name__ == "__main__":
    main()
