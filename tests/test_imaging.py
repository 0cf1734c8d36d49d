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
