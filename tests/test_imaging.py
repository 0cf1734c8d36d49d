"""PLA puncta quantification tests (synthetic ground truth)."""

import numpy as np
import pytest


def synthetic_image(rng, n_spots=25, H=128, W=128, spot_sigma=1.5,
                    background=0.2, gradient=0.3, noise=0.01):
    """Spots of known count on a sloped background with noise."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = background + gradient * xx / W
    pts = []
    while len(pts) < n_spots:
        y, x = rng.integers(10, H - 10), rng.integers(10, W - 10)
        if all(abs(y - py) + abs(x - px) > 12 for py, px in pts):
            pts.append((y, x))
    for y, x in pts:
        img += 1.0 * np.exp(-((yy - y) ** 2 + (xx - x) ** 2)
                            / (2 * spot_sigma**2))
    img += noise * rng.standard_normal((H, W))
    return img.astype(np.float32), pts


class TestPuncta:
    def test_counts_synthetic_spots(self):
        from gab1_shp2_tpu.imaging.puncta import count_puncta

        rng = np.random.default_rng(0)
        img, pts = synthetic_image(rng, n_spots=25)
        res = count_puncta(img, feature_size=8.0, min_distance=4)
        # within 10% of ground truth despite background + noise
        assert abs(int(res.count) - 25) <= 3

    def test_batched(self):
        import jax.numpy as jnp

        from gab1_shp2_tpu.imaging.puncta import count_puncta

        rng = np.random.default_rng(1)
        imgs, counts = [], []
        for n in (5, 15, 30):
            im, pts = synthetic_image(rng, n_spots=n)
            imgs.append(im)
            counts.append(len(pts))
        res = count_puncta(jnp.stack(imgs), feature_size=8.0,
                           min_distance=4)
        got = np.asarray(res.count)
        assert got.shape == (3,)
        # ordering preserved and roughly accurate
        assert got[0] < got[1] < got[2]
        for g, want in zip(got, counts):
            assert abs(int(g) - want) <= max(3, int(0.2 * want))

    def test_tophat_removes_gradient(self):
        from gab1_shp2_tpu.imaging.puncta import white_tophat

        xx = np.linspace(0, 1, 64, dtype=np.float32)
        img = np.broadcast_to(xx, (64, 64)).copy()
        th = np.asarray(white_tophat(img, 11))
        assert th.max() < 0.2  # the ramp is background, mostly removed

    def test_li_threshold_separates_bimodal(self):
        from gab1_shp2_tpu.imaging.puncta import li_threshold

        rng = np.random.default_rng(3)
        img = np.concatenate([
            rng.normal(0.2, 0.02, 2000),
            rng.normal(0.8, 0.02, 500)]).reshape(50, 50).astype(np.float32)
        t = float(li_threshold(img))
        assert 0.22 < t < 0.78
        assert abs(int((img > t).sum()) - 500) < 10
        # bounds clip exactly like CellProfiler's lower/upper bounds
        # (applied in the normalized [min, max] intensity range)
        t_lo = float(li_threshold(img, bounds=(0.9, 1.0)))
        assert t_lo >= img.min() + 0.9 * (img.max() - img.min()) - 1e-3

    def test_otsu_separates_bimodal(self):
        from gab1_shp2_tpu.imaging.puncta import otsu_threshold

        rng = np.random.default_rng(2)
        img = np.concatenate([
            rng.normal(0.2, 0.02, 2000),
            rng.normal(0.8, 0.02, 500)]).reshape(50, 50).astype(np.float32)
        t = float(otsu_threshold(img))
        # any threshold in the gap separates perfectly (between-class
        # variance is flat there); assert separation, not position
        assert 0.22 < t < 0.78
        assert abs(int((img > t).sum()) - 500) < 10


def synthetic_cells(rng, H=160, W=160):
    """Three disk 'cells' with known per-cell puncta counts.

    Returns (cell_img, pla_img, seeds, per_cell_truth)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    centers = [(40, 40, 26), (40, 120, 22), (120, 80, 30)]
    cell = np.full((H, W), 0.05)
    seeds = np.zeros((H, W), np.int32)
    truth = [4, 0, 7]
    pla = np.full((H, W), 0.1)
    for i, (cy, cx, r) in enumerate(centers):
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        cell[disk] = 0.8
        seeds[cy, cx] = i + 1
        # place puncta on a small grid inside the cell
        placed = 0
        for dy in (-10, 0, 10):
            for dx in (-10, 0, 10):
                if placed >= truth[i]:
                    break
                py, px = cy + dy, cx + dx
                pla += 1.0 * np.exp(-((yy - py) ** 2 + (xx - px) ** 2)
                                    / (2 * 1.5**2))
                placed += 1
    cell += 0.01 * rng.standard_normal((H, W))
    pla += 0.005 * rng.standard_normal((H, W))
    return (cell.astype(np.float32), pla.astype(np.float32), seeds,
            dict(zip([1, 2, 3], truth)))


class TestPerCell:
    """Per-cell puncta quantification — the pipelines' RelateObjects
    output (``Children_PLA_primary_objects_Count``), reference
    ``CellProfiler/GAB1-SHP2_PLA_quantification_40x+_max-zproj.cppipe``
    modules 14/53/57/64."""

    def test_identify_cells_finds_components(self):
        from gab1_shp2_tpu.imaging.puncta import identify_cells

        rng = np.random.default_rng(4)
        cell, _, _, _ = synthetic_cells(rng)
        labels = np.asarray(identify_cells(cell))
        ids = np.unique(labels[labels > 0])
        assert len(ids) == 3
        # each disk has area ~ pi r^2; check rough sizes survive
        areas = sorted(int((labels == i).sum()) for i in ids)
        assert areas[0] > 800 and areas[-1] < 4000

    def test_seeded_propagation_partitions_touching_cells(self):
        """Two touching disks: connected components would merge them;
        seed propagation (the module-53 'Propagation' route) splits
        the mask at the geodesic midline."""
        from gab1_shp2_tpu.imaging.puncta import (_propagate_labels,
                                                  identify_cells)
        import jax.numpy as jnp

        H = W = 96
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        mask = np.zeros((H, W), bool)
        mask |= (yy - 48) ** 2 + (xx - 34) ** 2 < 20**2
        mask |= (yy - 48) ** 2 + (xx - 62) ** 2 < 20**2
        seeds = np.zeros((H, W), np.int32)
        seeds[48, 34] = 1
        seeds[48, 62] = 2
        labels = np.asarray(_propagate_labels(jnp.asarray(seeds),
                                              jnp.asarray(mask)))
        assert set(np.unique(labels)) == {0, 1, 2}
        a1, a2 = (labels == 1).sum(), (labels == 2).sum()
        # roughly equal split, and the whole mask is assigned
        assert abs(a1 - a2) < 0.25 * (a1 + a2)
        assert (labels > 0).sum() == mask.sum()

    def test_per_cell_counts_match_truth(self):
        from gab1_shp2_tpu.imaging.puncta import count_puncta_per_cell

        rng = np.random.default_rng(5)
        cell, pla, seeds, truth = synthetic_cells(rng)
        res = count_puncta_per_cell(pla, cell, feature_size=6.0,
                                    min_distance=4)
        assert len(res.counts) == 3
        got = sorted(res.counts)
        assert got == sorted(truth.values()), (got, truth)

    def test_defaults_match_shipped_pipeline_parameters(self):
        """The per-cell API defaults must equal the shipped pipeline's
        parameterization, parsed from the .cppipe itself (skipped when
        the reference tree is absent)."""
        import inspect
        import os
        import re

        cppipe = ("/root/reference/CellProfiler/"
                  "GAB1-SHP2_PLA_quantification_40x+_max-zproj.cppipe")
        if not os.path.exists(cppipe):
            pytest.skip("reference CellProfiler pipelines not available")
        text = open(cppipe, encoding="utf-8", errors="replace").read()
        # module 57 (PLA_primary_objects): MCE threshold, correction
        # 0.2, lower bound 0.2; module 14 (Cells_mvHRas): correction
        # 1.08, smoothing filter 10
        pla = text.split("Name the primary objects to be identified"
                         ":PLA_primary_objects\n")[1]
        assert "Thresholding method:Minimum Cross-Entropy" in pla
        corr = float(re.search(r"Threshold correction factor:([\d.]+)",
                               pla).group(1))
        lo = float(re.search(r"Lower and upper bounds on threshold:"
                             r"([\d.]+)", pla).group(1))
        cells = text.split("Name the primary objects to be identified"
                           ":Cells_mvHRas\n")[1]
        cell_corr = float(re.search(r"Threshold correction factor:([\d.]+)",
                                    cells).group(1))
        smooth = float(re.search(r"Size of smoothing filter:([\d.]+)",
                                 cells).group(1))

        from gab1_shp2_tpu.imaging.puncta import (count_puncta_per_cell,
                                                  identify_cells)

        sig = inspect.signature(count_puncta_per_cell)
        assert sig.parameters["threshold_correction"].default == corr
        assert sig.parameters["threshold_bounds"].default[0] == lo
        assert sig.parameters["cell_threshold_correction"].default \
            == cell_corr
        csig = inspect.signature(identify_cells)
        assert csig.parameters["smoothing_scale"].default == smooth
        assert csig.parameters["threshold_correction"].default == cell_corr

    def test_seeded_counts_and_unassigned(self):
        from gab1_shp2_tpu.imaging.puncta import count_puncta_per_cell
        import jax.numpy as jnp

        rng = np.random.default_rng(6)
        cell, pla, seeds, truth = synthetic_cells(rng)
        # an extra punctum in the background must land in n_unassigned
        yy, xx = np.mgrid[0:160, 0:160].astype(np.float64)
        pla = pla + 1.0 * np.exp(-((yy - 8) ** 2 + (xx - 150) ** 2)
                                 / (2 * 1.5**2))
        res = count_puncta_per_cell(pla.astype(np.float32), cell,
                                    feature_size=6.0, min_distance=4,
                                    seeds=jnp.asarray(seeds))
        assert sorted(res.counts) == sorted(truth.values())
        assert res.n_unassigned >= 1
