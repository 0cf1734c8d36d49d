"""PLA puncta quantification (JAX).

The reference ships three declarative CellProfiler v5 pipelines
(``CellProfiler/*.cppipe``) that quantify proximity-ligation-assay
(PLA) puncta per cell — the experimental data behind the priors and the
26.4% SHP2-bound-GAB1 fit datum (SURVEY.md L8).  Their computational
core is: illumination/background correction (top-hat), speckle
enhancement at a ~10 px feature scale
(``GAB1-SHP2_PLA_quantification_40x+_max-zproj.cppipe`` module 43),
primary-object identification by thresholding + local maxima, and
per-cell counting.

This module is that core as a batched, jit-able JAX pipeline: white
top-hat via grayscale morphology, difference-of-Gaussians speckle
enhancement, local-maximum spot detection with an Otsu-style threshold,
and label-free per-region counting.  It runs on images stacked as
(batch, H, W) arrays — quantifying a whole imaging plate is one vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / w.sum()


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian filter on (..., H, W)."""
    radius = max(1, int(3 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    shape = img.shape
    x = img.reshape((-1,) + shape[-2:])  # (N, H, W)
    x = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius)),
                mode="edge")
    conv_rows = jax.vmap(jax.vmap(
        lambda s: jnp.convolve(s, k, mode="valid")))
    x = conv_rows(x)                                    # blur along W
    x = conv_rows(x.swapaxes(-1, -2)).swapaxes(-1, -2)  # blur along H
    return x.reshape(shape)


def _morph(img: jnp.ndarray, size: int, op) -> jnp.ndarray:
    """Grayscale erosion/dilation with a (size x size) square element."""
    pad = size // 2
    big = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
                  mode="edge")
    out = img
    first = True
    for dy in range(size):
        for dx in range(size):
            v = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_slice_in_dim(big, dy, img.shape[-2], -2),
                dx, img.shape[-1], -1)
            out = v if first else op(out, v)
            first = False
    return out


def white_tophat(img: jnp.ndarray, size: int = 11) -> jnp.ndarray:
    """img - opening(img): removes background larger than the element
    (the pipelines' TopHatTransform before speckle enhancement)."""
    eroded = _morph(img, size, jnp.minimum)
    opened = _morph(eroded, size, jnp.maximum)
    return img - opened


def enhance_speckles(img: jnp.ndarray, feature_size: float = 10.0
                     ) -> jnp.ndarray:
    """Difference-of-Gaussians band-pass at the puncta scale
    (EnhanceOrSuppressFeatures 'Speckles', feature size 10 px)."""
    lo = gaussian_blur(img, feature_size / 6.0)
    bg = gaussian_blur(img, feature_size)
    return jnp.maximum(lo - bg, 0.0)


def otsu_threshold(img: jnp.ndarray, nbins: int = 64) -> jnp.ndarray:
    """Otsu's threshold over the trailing (H, W) axes."""
    lo = img.min(axis=(-2, -1), keepdims=True)
    hi = img.max(axis=(-2, -1), keepdims=True)
    norm = (img - lo) / jnp.maximum(hi - lo, 1e-12)
    edges = jnp.linspace(0.0, 1.0, nbins + 1)[1:-1]
    flat = norm.reshape(norm.shape[:-2] + (-1,))

    def score(t):
        w1 = (flat <= t).mean(axis=-1)
        w2 = 1.0 - w1
        m1 = jnp.where(w1 > 0, jnp.where(flat <= t, flat, 0).sum(-1)
                       / jnp.maximum(w1 * flat.shape[-1], 1e-12), 0.0)
        m2 = jnp.where(w2 > 0, jnp.where(flat > t, flat, 0).sum(-1)
                       / jnp.maximum(w2 * flat.shape[-1], 1e-12), 0.0)
        return w1 * w2 * (m1 - m2) ** 2

    scores = jax.vmap(score)(edges)          # (nbins-1, ...)
    best = edges[jnp.argmax(scores, axis=0)]
    return lo[..., 0, 0] + best * (hi[..., 0, 0] - lo[..., 0, 0])


class PunctaResult(NamedTuple):
    count: jnp.ndarray       # (...,) number of detected puncta
    mask: jnp.ndarray        # (..., H, W) detected maxima
    enhanced: jnp.ndarray    # (..., H, W) speckle-enhanced image


@partial(jax.jit, static_argnames=("feature_size", "tophat_size",
                                  "min_distance"))
def count_puncta(img: jnp.ndarray, *, feature_size: float = 10.0,
                 tophat_size: int = 11, min_distance: int = 3,
                 threshold: Optional[jnp.ndarray] = None) -> PunctaResult:
    """Count PLA puncta in (..., H, W) images.

    Pipeline: white top-hat -> speckle DoG -> Otsu threshold ->
    local-maximum detection within ``min_distance`` -> count.
    """
    img = img.astype(jnp.float32)
    th = white_tophat(img, tophat_size)
    enh = enhance_speckles(th, feature_size)
    if threshold is None:
        threshold = otsu_threshold(enh)
    thr = jnp.asarray(threshold)[..., None, None]
    # local maxima: value equals the neighborhood max and exceeds thr
    size = 2 * min_distance + 1
    neigh_max = _morph(enh, size, jnp.maximum)
    mask = jnp.logical_and(enh >= neigh_max - 1e-12, enh > thr)
    count = mask.sum(axis=(-2, -1))
    return PunctaResult(count=count, mask=mask, enhanced=enh)
