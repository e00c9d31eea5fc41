"""FID math tests: closed-form Frechet distance identities and the
npz-pipeline plumbing with a stub feature extractor."""

import numpy as np

from ladder_tpu.utils.fid import (
    compute_FID_score,
    fid_from_activations,
    frechet_distance,
    preprocess_input_generated,
    preprocess_input_original,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.standard_normal(5)
    a = rng.standard_normal((5, 5))
    sigma = a @ a.T + np.eye(5)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    """Equal covariances: FID = ||mu1-mu2||^2."""
    sigma = np.eye(4)
    mu1 = np.zeros(4)
    mu2 = np.full(4, 2.0)
    np.testing.assert_allclose(frechet_distance(mu1, sigma, mu2, sigma),
                               16.0, rtol=1e-6)


def test_frechet_distance_scalar_case():
    """1-D closed form: (m1-m2)^2 + (s1-s2)^2 for std-devs s."""
    got = frechet_distance(np.array([1.0]), np.array([[4.0]]),
                           np.array([3.0]), np.array([[9.0]]))
    want = (1 - 3) ** 2 + (2 - 3) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fid_from_activations_sample_estimate():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((5000, 8))
    b = rng.standard_normal((5000, 8)) + 1.0
    fid = fid_from_activations(a, b)
    # true value ~ ||1||^2 = 8
    assert 7.0 < fid < 9.0
    same = fid_from_activations(a, a + 0.0)
    assert same < 1e-6


def test_preprocessing():
    x = np.array([0.0, 127.5, 255.0])
    np.testing.assert_allclose(preprocess_input_original(x), [-1, 0, 1])
    y = np.array([-0.5, 0.5, 1.5])
    np.testing.assert_allclose(preprocess_input_generated(y), [-1, 0, 1])


def test_compute_fid_score_with_stub_extractor(tmp_path):
    rng = np.random.default_rng(2)
    imgs1 = rng.integers(0, 256, (64, 32, 32, 3)).astype(np.float32)
    imgs2 = np.clip(imgs1 / 255.0 + 0.1 * rng.standard_normal(imgs1.shape),
                    0, 1).astype(np.float32)
    f1, f2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    np.savez(f1, sampled_images=imgs1)
    np.savez(f2, sampled_images=imgs2)

    def feature_fn(images):
        return images.reshape(images.shape[0], -1)[:, :16]

    score = compute_FID_score(f1, f2, feature_fn=feature_fn)
    assert np.isfinite(score) and score >= 0
