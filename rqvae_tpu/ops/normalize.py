"""L2 normalization matching torch.nn.functional.normalize semantics.

Reference parity: /root/reference/modules/normalize.py (l2norm with
denominator clamped to eps, default eps=1e-12).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2norm(x, axis: int = -1, eps: float = 1e-12):
    """x / max(||x||_2, eps) along `axis`."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
