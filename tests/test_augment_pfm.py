"""Photometric augmentation parity vs the reference torch formulas, and
PFM round-trip (the reference's own reader is py3-broken)."""

import numpy as np
import pytest

from neuralrgbd_tpu.data import augment
from neuralrgbd_tpu.infer.export import export_pfm, read_pfm


def test_grayscale_matches_torch_formula():
    rng = np.random.RandomState(0)
    img = rng.rand(8, 9, 3).astype(np.float32)
    gs = augment.grayscale(img)
    want = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    for c in range(3):
        np.testing.assert_allclose(gs[..., c], want, rtol=1e-6)


def test_lighting_zero_alphastd_is_identity():
    rng = np.random.RandomState(1)
    img = rng.rand(6, 7, 3).astype(np.float32)
    np.testing.assert_array_equal(
        augment.lighting(img, rng, alphastd=0.0), img)


def test_lighting_matches_reference_math():
    """preprocess.py:101-111: rgb[c] = sum_j eigvec[c,j]*alpha[j]*eigval[j],
    added per channel."""
    img = np.zeros((2, 2, 3), np.float32)

    class FixedRng:
        def normal(self, mu, std, size):
            return np.array([1.0, -2.0, 0.5], np.float32)

    out = augment.lighting(img, FixedRng(), alphastd=0.1)
    alpha = np.array([1.0, -2.0, 0.5], np.float32)
    want = (augment.IMAGENET_PCA_EIGVEC * alpha[None, :]
            * augment.IMAGENET_PCA_EIGVAL[None, :]).sum(axis=1)
    np.testing.assert_allclose(out[0, 0], want, rtol=1e-6)


def test_color_jitter_window_consistency():
    """Same rng seed + order => identical transform for every frame of a
    window (the photoconsistency-preserving usage)."""
    rng_img = np.random.RandomState(2)
    imgs = [rng_img.rand(5, 6, 3).astype(np.float32) for _ in range(3)]
    outs1 = [augment.color_jitter(im, np.random.RandomState(7),
                                  order=[2, 0, 1]) for im in imgs]
    outs2 = [augment.color_jitter(im, np.random.RandomState(7),
                                  order=[2, 0, 1]) for im in imgs]
    for a, b in zip(outs1, outs2):
        np.testing.assert_array_equal(a, b)
    # and it actually changes the image
    assert not np.allclose(outs1[0], imgs[0])


def test_jitter_parity_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    img = rng.rand(6, 7, 3).astype(np.float32)
    t = torch.from_numpy(img.transpose(2, 0, 1)).clone()

    # torch Contrast with a fixed alpha (preprocess.py:146-155)
    gs_t = t.clone()
    gs_t[0].mul_(0.299).add_(0.587 * gs_t[1]).add_(0.114 * gs_t[2])
    gs_t[1].copy_(gs_t[0])
    gs_t[2].copy_(gs_t[0])
    gs_t.fill_(gs_t.mean())
    want = t.lerp(gs_t, 0.3).numpy().transpose(1, 2, 0)

    class FixedRng:
        def uniform(self, a, b):
            return 0.3

    got = augment.contrast(img, FixedRng(), var=0.4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("color", [True, False])
def test_pfm_round_trip(tmp_path, color):
    rng = np.random.RandomState(4)
    arr = rng.randn(11, 13, 3).astype(np.float32) if color else \
        rng.randn(11, 13).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    export_pfm(p, arr, scale=1.0)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, arr)
    assert scale == 1.0


def test_pfm_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.pfm")
    open(p, "wb").write(b"P5\n3 3\n255\n" + b"\x00" * 9)
    with pytest.raises(ValueError):
        read_pfm(p)
