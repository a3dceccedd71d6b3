"""Scalar → RGB colormaps (reference ``visualization/colormap.hpp:7-74``:
JET / GRAY / BLUE2RED), jittable for device-side colorization of residuals,
curvature, confidence, etc."""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(values, vmin=None, vmax=None):
    v = values.astype(jnp.float32)
    lo = jnp.min(v) if vmin is None else jnp.float32(vmin)
    hi = jnp.max(v) if vmax is None else jnp.float32(vmax)
    return jnp.clip((v - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0)


def colormap_gray(values, vmin=None, vmax=None):
    t = _normalize(values, vmin, vmax)
    return jnp.stack([t, t, t], axis=-1)


def colormap_blue2red(values, vmin=None, vmax=None):
    t = _normalize(values, vmin, vmax)
    return jnp.stack([t, jnp.zeros_like(t), 1.0 - t], axis=-1)


def colormap_jet(values, vmin=None, vmax=None):
    t = _normalize(values, vmin, vmax) * 4.0
    r = jnp.clip(jnp.minimum(t - 1.5, -t + 4.5), 0.0, 1.0)
    g = jnp.clip(jnp.minimum(t - 0.5, -t + 3.5), 0.0, 1.0)
    b = jnp.clip(jnp.minimum(t + 0.5, -t + 2.5), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def colormap(values, name: str = "jet", vmin=None, vmax=None):
    return {
        "jet": colormap_jet,
        "gray": colormap_gray,
        "blue2red": colormap_blue2red,
    }[name](values, vmin, vmax)
