"""K-nearest-neighbor mean distance for scale initialization.

Replaces the reference's CUDA ``distCUDA2`` (submodules/simple-knn/
simple_knn.cu:147-200: Morton-ordered boxes + 3-NN search), used once at
scene init to size each gaussian (scene/gaussian_model.py:134-135).

Init-time, host-side: scipy cKDTree (the reference itself prototypes this in
KDtree_test.py). A pure-JAX blocked fallback exists for environments without
scipy and doubles as the cross-check oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """Mean of squared distances to the 3 nearest neighbors, per point.
    Prefers the native C++ implementation (native/simple_knn.cpp), falling
    back to scipy cKDTree, then the blocked JAX kernel."""
    from gaussian_splatting_with_eye_tracking_tpu import native

    out = native.mean_sq_dist_3nn_native(points)
    if out is not None:
        return out
    try:
        from scipy.spatial import cKDTree
    except ImportError:
        return np.asarray(mean_sq_dist_3nn_jax(jnp.asarray(points)))
    tree = cKDTree(np.asarray(points, np.float64))
    d, _ = tree.query(points, k=4, workers=-1)  # includes self at d=0
    return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def mean_sq_dist_3nn_jax(points: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Brute-force blocked 3-NN in JAX (O(N^2), for tests / small N)."""
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)

    def block_fn(q):
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        # exclude self (distance 0); take 3 smallest of the rest
        d2 = jnp.where(d2 <= 1e-12, jnp.inf, d2)
        three = -jax.lax.top_k(-d2, 3)[0]
        return jnp.mean(three, axis=-1)

    out = jax.lax.map(block_fn, pts.reshape(-1, block, 3))
    return out.reshape(-1)[:n]
