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


def li_threshold(img: jnp.ndarray, *, correction: float = 1.0,
                 bounds=(0.0, 1.0), smoothing_scale: float = 0.0,
                 n_iter: int = 50) -> jnp.ndarray:
    """Minimum cross-entropy (Li) threshold over trailing (H, W) axes.

    CellProfiler's default "Minimum Cross-Entropy" thresholding method
    (all three shipped pipelines use it for cells and puncta, e.g.
    ``GAB1-SHP2_PLA_quantification_40x+_max-zproj.cppipe`` module 14:
    correction 1.08; module 57 PLA puncta: correction 0.2, bounds
    (0.2, 1.0)).  Li's fixed-point iteration
    ``t <- (m_bg - m_fg) / (log m_bg - log m_fg)`` on the [0, 1]
    normalized intensities; ``correction`` multiplies and ``bounds``
    clip the normalized threshold exactly as CellProfiler's
    "Threshold correction factor" / "Lower and upper bounds" do.
    ``smoothing_scale`` is CellProfiler's pre-threshold Gaussian
    (sigma = scale / 2.35, its FWHM convention)."""
    img = img.astype(jnp.float32)
    if smoothing_scale > 0:
        img = gaussian_blur(img, smoothing_scale / 2.35)
    lo = img.min(axis=(-2, -1), keepdims=True)
    hi = img.max(axis=(-2, -1), keepdims=True)
    xn = (img - lo) / jnp.maximum(hi - lo, 1e-12) + 1e-4  # Li needs > 0
    flat = xn.reshape(xn.shape[:-2] + (-1,))

    def body(i, t):
        below = flat <= t[..., None]
        nb = below.sum(-1).astype(jnp.float32)
        nf = flat.shape[-1] - nb
        mb = jnp.where(below, flat, 0.0).sum(-1) / jnp.maximum(nb, 1.0)
        mf = jnp.where(below, 0.0, flat).sum(-1) / jnp.maximum(nf, 1.0)
        mb = jnp.maximum(mb, 1e-6)
        mf = jnp.maximum(mf, 1e-6)
        t_new = (mb - mf) / (jnp.log(mb) - jnp.log(mf))
        # degenerate split (all pixels one side): keep current t
        ok = jnp.logical_and(nb > 0, nf > 0)
        return jnp.where(ok, t_new, t)

    t = jax.lax.fori_loop(0, n_iter, body, flat.mean(-1))
    t = jnp.clip(t * correction, bounds[0], bounds[1])
    return lo[..., 0, 0] + t * (hi[..., 0, 0] - lo[..., 0, 0])


@partial(jax.jit, static_argnames=("feature_size", "tophat_size",
                                  "min_distance", "threshold_method",
                                  "threshold_correction",
                                  "threshold_bounds"))
def count_puncta(img: jnp.ndarray, *, feature_size: float = 10.0,
                 tophat_size: int = 11, min_distance: int = 3,
                 threshold: Optional[jnp.ndarray] = None,
                 threshold_method: str = "otsu",
                 threshold_correction: float = 1.0,
                 threshold_bounds=(0.0, 1.0)) -> PunctaResult:
    """Count PLA puncta in (..., H, W) images.

    Pipeline: white top-hat -> speckle DoG -> threshold ->
    local-maximum detection within ``min_distance`` -> count.

    ``threshold_method="li"`` with ``threshold_correction=0.2`` and
    ``threshold_bounds=(0.2, 1.0)`` reproduces the shipped PLA-puncta
    identification settings (``GAB1-SHP2_PLA_quantification_40x+_
    max-zproj.cppipe`` module 57: Minimum Cross-Entropy, correction
    0.2, lower bound 0.2, declump-by-shape with suppression radius 7
    — our ``min_distance`` plays that radius's role).
    """
    img = img.astype(jnp.float32)
    th = white_tophat(img, tophat_size)
    enh = enhance_speckles(th, feature_size)
    if threshold is None:
        if threshold_method == "li":
            threshold = li_threshold(enh, correction=threshold_correction,
                                     bounds=threshold_bounds)
        else:
            threshold = otsu_threshold(enh)
    thr = jnp.asarray(threshold)[..., None, None]
    # local maxima: value equals the neighborhood max and exceeds thr
    size = 2 * min_distance + 1
    neigh_max = _morph(enh, size, jnp.maximum)
    mask = jnp.logical_and(enh >= neigh_max - 1e-12, enh > thr)
    count = mask.sum(axis=(-2, -1))
    return PunctaResult(count=count, mask=mask, enhanced=enh)


# --- per-cell quantification ---------------------------------------------
#
# The pipelines do not stop at an image-level puncta count: they
# identify cells (IdentifyPrimaryObjects "Cells_mvHRas", module 14:
# MCE threshold, correction 1.08, smoothing 10, no declumping; or
# nuclei-seeded IdentifySecondaryObjects "Propagation", module 53) and
# relate puncta to their enclosing cell (RelateObjects module 64 ->
# ``Children_PLA_primary_objects_Count`` per cell).  The equivalents
# below are scatter-free, jit-able label propagation: connected
# components / geodesic nearest-seed propagation by iterated masked
# 3x3 max-dilation inside a ``lax.while_loop``.


def _propagate_labels(labels: jnp.ndarray, mask: jnp.ndarray, *,
                      flood: bool = False) -> jnp.ndarray:
    """Propagate labels through ``mask`` by iterated 3x3 dilation
    inside a ``lax.while_loop`` until fixpoint (scatter-free — TPU
    cannot lower scatter, see CLAUDE.md).

    ``flood=True``: every pixel takes the max label in its
    neighborhood — with pixel-index seeds this computes connected
    components (each component converges to its max index).
    ``flood=False``: only UNLABELED masked pixels take a neighbor's
    label; existing labels are frozen, so sparse seeds grow as fronts
    and each pixel ends with its geodesically nearest seed (ties at
    the contact line -> larger label).  This is the front propagation
    CellProfiler's "Propagation" secondary-object method performs
    (regularization 0)."""
    labels = jnp.where(mask, labels, 0).astype(jnp.int32)

    def cond(carry):
        labels, changed = carry
        return changed

    def step(carry):
        labels, _ = carry
        grown = _morph(labels, 3, jnp.maximum)
        if flood:
            new = jnp.maximum(labels, grown)
        else:
            new = jnp.where(labels > 0, labels, grown)
        new = jnp.where(mask, new, 0)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, step, (labels, jnp.array(True)))
    return labels


@partial(jax.jit, static_argnames=("smoothing_scale", "threshold_correction"))
def identify_cells(img: jnp.ndarray, *, smoothing_scale: float = 10.0,
                   threshold_correction: float = 1.08,
                   seeds: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Label cell regions in a cytoplasmic/membrane-marker image.

    Mirrors ``IdentifyPrimaryObjects`` "Cells_mvHRas" (module 14 of the
    GAB1-SHP2 pipeline: Gaussian smoothing (size 10), global Minimum
    Cross-Entropy threshold with correction factor 1.08, clumped-object
    separation "None") on (H, W) or (batch, H, W) images.  With
    ``seeds`` (an int label image of nuclei/markers, 0 = background)
    the cell mask is partitioned by geodesic label propagation instead
    — the "Propagation" ``IdentifySecondaryObjects`` route (module 53).

    Returns an int32 label image; 0 is background.  Labels are
    arbitrary positive ints (pixel-index based for the unseeded route);
    compact them host-side with ``puncta_per_cell``."""
    img = img.astype(jnp.float32)
    smooth = gaussian_blur(img, smoothing_scale / 2.35)
    thr = li_threshold(smooth, correction=threshold_correction)
    mask = smooth > thr[..., None, None]
    if seeds is None:
        h, w = img.shape[-2:]
        seeds = (1 + jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
        seeds = jnp.broadcast_to(seeds, img.shape)
        return _propagate_labels(seeds, mask, flood=True)
    return _propagate_labels(seeds, mask, flood=False)


class PerCellCounts(NamedTuple):
    cell_ids: "object"       # (n_cells,) compacted cell ids (1..n)
    counts: "object"         # (n_cells,) puncta per cell
    areas: "object"          # (n_cells,) cell pixel areas
    n_unassigned: int        # puncta outside every cell


def puncta_per_cell(cell_labels, puncta_mask, *, min_area: int = 0
                    ) -> PerCellCounts:
    """Relate puncta to cells: per-cell puncta counts (host-side).

    The counting equivalent of ``RelateObjects`` (module 64,
    parent ``Cells_mvHRas_2ndry`` / child ``PLA_primary_objects``) ->
    the pipelines' exported ``Children_PLA_primary_objects_Count``.
    ``min_area`` drops labels smaller than the pipelines' minimum cell
    diameter (module 14 discards objects outside 200-4000 px diameter).
    Host-side NumPy on the jit-produced label/mask images: the per-cell
    table is analysis output, not hot-path compute."""
    import numpy as np

    L = np.asarray(cell_labels)
    M = np.asarray(puncta_mask).astype(bool)
    ids, inverse, areas = np.unique(L, return_inverse=True,
                                    return_counts=True)
    hit = np.bincount(inverse.reshape(L.shape)[M], minlength=len(ids))
    keep = (ids > 0) & (areas >= min_area)
    n_unassigned = int(M.sum() - hit[keep].sum())
    return PerCellCounts(
        cell_ids=np.arange(1, keep.sum() + 1),
        counts=hit[keep].astype(int),
        areas=areas[keep].astype(int),
        n_unassigned=n_unassigned,
    )


def count_puncta_per_cell(pla_img: jnp.ndarray, cell_img: jnp.ndarray, *,
                          feature_size: float = 10.0, tophat_size: int = 11,
                          min_distance: int = 3,
                          threshold_method: str = "li",
                          threshold_correction: float = 0.2,
                          threshold_bounds=(0.2, 1.0),
                          cell_smoothing_scale: float = 10.0,
                          cell_threshold_correction: float = 1.08,
                          seeds: Optional[jnp.ndarray] = None,
                          min_cell_area: int = 0) -> PerCellCounts:
    """Full per-cell PLA quantification on one (H, W) image pair.

    ``pla_img`` is the PLA channel, ``cell_img`` the cell-marker
    (mvHRas) channel.  Defaults follow the GAB1-SHP2 40x pipeline's
    shipped parameterization (see ``count_puncta`` / ``identify_cells``
    docstrings for the module-by-module mapping)."""
    res = count_puncta(pla_img, feature_size=feature_size,
                       tophat_size=tophat_size, min_distance=min_distance,
                       threshold_method=threshold_method,
                       threshold_correction=threshold_correction,
                       threshold_bounds=threshold_bounds)
    labels = identify_cells(cell_img, smoothing_scale=cell_smoothing_scale,
                            threshold_correction=cell_threshold_correction,
                            seeds=seeds)
    return puncta_per_cell(labels, res.mask, min_area=min_cell_area)
