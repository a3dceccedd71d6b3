"""Mean/covariance estimation, plain and robust (MCD).

TPU-native redesign of ``include/cilantro/core/covariance.hpp``:

* ``Covariance::operator()`` (``covariance.hpp:31-179``) — serial/OpenMP
  reduction over a point set or an index subset — becomes masked batched
  means/outer-products; the neighborhood variant is fully vectorized over all
  queries at once (one ``(Q, k, D)`` gather feeding einsums) instead of an
  OpenMP loop of small reductions.
* ``MinimumCovarianceDeterminant`` (``covariance.hpp:188-371``) — random
  minimal subsets → Mahalanobis re-weighting → keep-h refinement → best
  determinant — becomes a ``vmap`` over trials with ``lax.top_k`` standing in
  for the partial sort.
* validity gating by ``min_sample_size`` mirrors the reference's NaN-fill
  discipline (``covariance.hpp:35-39``): invalid outputs are flagged via a
  boolean instead of exceptions (none exist under jit).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mean_and_covariance(
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    min_sample_size: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked mean and covariance over the leading axis.

    ``points``: ``(..., N, D)``; ``mask``: ``(..., N)`` bool or None.
    Returns ``(mean (..., D), cov (..., D, D), valid (...,))`` where ``valid``
    requires at least ``min_sample_size`` (default ``D + 1``, as the
    reference) contributing samples. Normalization is ``1/(n-1)`` matching the
    reference's unbiased estimate.
    """
    d = points.shape[-1]
    if min_sample_size is None:
        min_sample_size = d + 1
    if mask is None:
        n = jnp.array(points.shape[-2], jnp.float32)
        mean = jnp.mean(points, axis=-2)
        centered = points - mean[..., None, :]
        cov = jnp.einsum("...ni,...nj->...ij", centered, centered) / jnp.maximum(
            n - 1.0, 1.0
        )
        valid = jnp.broadcast_to(
            jnp.array(points.shape[-2] >= min_sample_size), points.shape[:-2]
        )
        return mean, cov, valid
    m = mask.astype(points.dtype)
    n = jnp.sum(m, axis=-1)
    safe_n = jnp.maximum(n, 1.0)
    mean = jnp.einsum("...n,...ni->...i", m, points) / safe_n[..., None]
    centered = (points - mean[..., None, :]) * m[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", centered, centered) / jnp.maximum(
        n - 1.0, 1.0
    )[..., None, None]
    return mean, cov, n >= min_sample_size


def neighborhood_mean_cov(
    points: jax.Array,
    indices: jax.Array,
    mask: jax.Array,
    min_sample_size: Optional[int] = None,
):
    """Per-query mean/cov over gathered neighborhoods.

    ``points (N, D)``, ``indices (Q, k)``, ``mask (Q, k)`` →
    ``(mean (Q, D), cov (Q, D, D), valid (Q,))``. This is the vectorized form
    of the reference's per-point ``Covariance()(points, nn, mean, cov)`` calls
    inside the normal-estimation hot loop (``normal_estimation.hpp:297-307``).
    """
    gathered = points[indices]  # (Q, k, D)
    return mean_and_covariance(gathered, mask, min_sample_size)


# ---------------------------------------------------------------------------
# Minimum Covariance Determinant (robust covariance).
# ---------------------------------------------------------------------------


def _logdet_psd(cov: jax.Array) -> jax.Array:
    """log|Σ| via eigenvalues, safe for near-singular matrices."""
    w = jnp.linalg.eigvalsh(cov)
    return jnp.sum(jnp.log(jnp.maximum(w, 1e-30)), axis=-1)


def mahalanobis2(points, mean, cov) -> jax.Array:
    """Squared Mahalanobis distances (reference
    ``MinimumCovarianceDeterminant::mahalanobisDistance``,
    ``covariance.hpp:287-304``)."""
    d = points.shape[-1]
    prec = jnp.linalg.inv(cov + 1e-12 * jnp.eye(d, dtype=cov.dtype))
    diff = points - mean[..., None, :]
    return jnp.einsum("...ni,...ij,...nj->...n", diff, prec, diff)


@partial(
    jax.jit,
    static_argnames=(
        "num_trials",
        "num_refinements",
        "keep_fraction",
        "min_sample_size",
        "chi_square_threshold",
    ),
)
def mcd_mean_cov(
    key: jax.Array,
    points: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    num_trials: int = 6,
    num_refinements: int = 3,
    keep_fraction: float = 0.75,
    min_sample_size: Optional[int] = None,
    chi_square_threshold: float = -1.0,
):
    """Minimum Covariance Determinant over one point set.

    Mirrors the reference algorithm (``covariance.hpp:188-371``): ``num_trials``
    random (D+1)-subsets, each refined ``num_refinements`` times by re-fitting
    on the ``h = keep_fraction·n`` smallest-Mahalanobis points, keeping the
    fit with smallest covariance determinant. Defaults follow the reference
    (``covariance.hpp:365-367``: 6 trials / 3 refinements / keep 0.75).

    If ``chi_square_threshold > 0``, the first point of the set (the query
    point, which leads its own neighborhood) is additionally tested against
    the robust covariance ellipse and ``valid`` is false when
    ``(x₀−μ)ᵀ Σ⁻¹ (x₀−μ) > threshold`` — the reference's chi-square inlier
    gate (``covariance.hpp:352-359``; disabled by default, ``:369``).

    Returns ``(mean, cov, valid)``. Fixed shapes: ``h`` is computed from the
    static capacity; masked-out points get +inf distance so they are never
    kept.
    """
    n, d = points.shape
    if mask is None:
        mask = jnp.ones(n, bool)
    if min_sample_size is None:
        min_sample_size = d + 1
    h = max(int(keep_fraction * n), d + 1)
    big = jnp.float32(1e30)

    def one_trial(k):
        # Random minimal subset of size d+1 (reference RandomElementSelector).
        scores = jax.random.uniform(k, (n,)) + jnp.where(mask, 0.0, 2.0)
        _, subset = jax.lax.top_k(-scores, d + 1)
        sub_mask = jnp.zeros(n, bool).at[subset].set(True) & mask
        mean, cov, _ = mean_and_covariance(points, sub_mask, d + 1)

        def refine(carry, _):
            mean, cov = carry
            m2 = mahalanobis2(points, mean, cov)
            m2 = jnp.where(mask, m2, big)
            _, keep = jax.lax.top_k(-m2, h)
            keep_mask = jnp.zeros(n, bool).at[keep].set(True) & mask
            mean, cov, _ = mean_and_covariance(points, keep_mask, d + 1)
            return (mean, cov), None

        (mean, cov), _ = jax.lax.scan(
            refine, (mean, cov), None, length=num_refinements
        )
        return mean, cov, _logdet_psd(cov)

    keys = jax.random.split(key, num_trials)
    means, covs, logdets = jax.vmap(one_trial)(keys)
    best = jnp.argmin(logdets)
    mean, cov = means[best], covs[best]
    valid = jnp.sum(mask) >= min_sample_size
    if chi_square_threshold > 0.0:
        m2_query = mahalanobis2(points[:1], mean, cov)[0]
        valid &= m2_query <= chi_square_threshold
    return mean, cov, valid
