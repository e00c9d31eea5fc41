"""SLP interpolation tests (SURVEY.md §4): the optimised path improves
likelihood vs the straight line and routes around low-density regions."""

import numpy as np

import jax
import jax.numpy as jnp

from ladder_tpu.interp import (
    interpolation_objective,
    optimise_slp,
    prior_logpdf_fn,
    straight_line_init,
)


def test_straight_line_init():
    start = jnp.array([0.0, 0.0])
    end = jnp.array([9.0, 0.0])
    pts = straight_line_init(start, end, 8)
    assert pts.shape == (8, 2)
    np.testing.assert_allclose(np.asarray(pts[:, 0]),
                               np.arange(1, 9, dtype=np.float32), rtol=1e-5)


def test_objective_components():
    start = jnp.array([0.0, 0.0])
    end = jnp.array([3.0, 0.0])
    pts = jnp.array([[1.0, 0.0], [2.0, 0.0]])
    log_prob = prior_logpdf_fn({"prior": "standard_gaussian", "code_size": 2})
    obj, aux = interpolation_objective(pts, start, end, log_prob)
    np.testing.assert_allclose(float(aux["path_length"]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(float(aux["step_var"]), 0.0, atol=1e-6)


def test_slp_improves_density_two_mode_prior():
    """Prior = two gaussians at (+-3, 0) and a bridge at (0, 2): SLP between
    the modes should bend toward the bridge, beating the straight line on
    likelihood."""
    w = np.array([0.4, 0.4, 0.2], dtype=np.float32)
    m = np.array([[-3.0, 0.0], [3.0, 0.0], [0.0, 2.0]], dtype=np.float32)
    K = np.stack([np.eye(2) * 0.3] * 3).astype(np.float32)
    log_prob = prior_logpdf_fn({"prior": "ours", "representation_size": 2},
                               gm=(w, m, K))
    start = jnp.array([-3.0, 0.0])
    end = jnp.array([3.0, 0.0])
    init = straight_line_init(start, end, 8)
    pts, hist = optimise_slp(init, start, end, log_prob, n_iter=400)
    # likelihood strictly better than the straight line
    assert float(hist["neg_ll"][-1]) < float(hist["neg_ll"][0])
    # overall objective decreased
    assert float(hist["obj"][-1]) < float(hist["obj"][0])
    # the path bends upward toward the bridge mode
    assert float(jnp.max(pts[:, 1])) > 0.3
    # history shapes
    assert hist["obj"].shape == (400,)


def test_slp_step_variance_regularised():
    log_prob = prior_logpdf_fn({"prior": "standard_gaussian", "code_size": 2})
    start = jnp.array([-2.0, 0.0])
    end = jnp.array([2.0, 0.0])
    rng = jax.random.PRNGKey(0)
    init = jax.random.normal(rng, (6, 2)) * 2
    pts, hist = optimise_slp(init, start, end, log_prob, n_iter=800)
    # equal-step constraint drives step variance well below the random init
    assert float(hist["step_var"][-1]) < 0.5 * float(hist["step_var"][0])
