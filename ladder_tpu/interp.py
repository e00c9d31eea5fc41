"""Shortest-likelihood-path (SLP) latent interpolation.

Re-expression of the reference demo notebook's optimisation graph
(latent-space-interpolation-mnist.ipynb cells 18-21): k intermediate latent
points are optimised by Adam against

    obj = w_path * sum_i ||p_{i+1} - p_i||
        + w_eq   * std_i(||p_{i+1} - p_i||)
        - sum_i log p_prior(p_i)

with elementwise +-1 gradient clipping, Adam(beta1=.9, beta2=.95), lr 1e-2,
500 iterations (cells 19, 21; weights w_eq=100, w_path=10 from cell 19).

TPU-native: the whole 500-iteration optimisation is ONE jitted lax.scan — a
single dispatch instead of the reference's 500 sess.run round-trips. The
prior density is whichever log-prob closure the caller supplies (fitted GM,
standard normal, vamp mixture — see prior_logpdf_fn), so the same optimiser
serves every prior mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ladder_tpu.ops.distributions import (
    diag_gaussian_logpdf,
    diag_mixture_logpdf,
    gmm_cholesky,
    gmm_logpdf,
)
from ladder_tpu.training.optim import ADAM_B1, ADAM_B2, ADAM_EPS


def prior_logpdf_fn(config, gm=None, vamp_params=None):
    """Build log p(.) for the configured prior (demo_tools.py:79-115).

    gm: (weights, means, covs) for 'ours'/'GMM'; vamp_params: (means, stds)
    for vampPrior.
    """
    prior = config["prior"]
    if prior in ("GMM", "ours"):
        w, m, K = gm
        chols = gmm_cholesky(jnp.asarray(K))
        w, m = jnp.asarray(w), jnp.asarray(m)
        return lambda x: gmm_logpdf(x, w, m, chols)
    if prior in ("standard_gaussian", "hierarchical"):
        d = (config["code_size"] if prior == "standard_gaussian"
             else config["representation_size"])
        zeros, ones = jnp.zeros(d), jnp.ones(d)
        return lambda x: diag_gaussian_logpdf(x, zeros, ones)
    if prior == "vampPrior":
        means, stds = vamp_params
        k = means.shape[0]
        w = jnp.full((k,), 1.0 / k)
        return lambda x: diag_mixture_logpdf(x, w, means, stds)
    raise ValueError(prior)


def interpolation_objective(pts, start, end, log_prob, w_path=10.0,
                            w_eq=100.0):
    """(obj, aux) for the SLP objective (notebook cell 18)."""
    full_start = jnp.concatenate([start[None], pts], axis=0)
    full_end = jnp.concatenate([pts, end[None]], axis=0)
    seg = jnp.sqrt(jnp.sum(jnp.square(full_end - full_start), axis=1))
    path_length = jnp.sum(seg)
    eq = jnp.std(seg)
    neg_ll = -jnp.sum(log_prob(pts))
    obj = w_path * path_length + w_eq * eq + neg_ll
    return obj, dict(path_length=path_length, step_var=eq, neg_ll=neg_ll)


@partial(jax.jit, static_argnames=("log_prob", "n_iter", "w_path", "w_eq"))
def optimise_slp(init_pts, start, end, log_prob, n_iter=500, lr=1e-2,
                 w_path=10.0, w_eq=100.0):
    """Run the full Adam optimisation as one lax.scan.

    Returns (final_pts, history) where history holds per-iteration
    (obj, path_length, step_var, neg_ll) — the notebook's loss records.
    """

    def step(carry, _):
        pts, m, v, t = carry
        (obj, aux), g = jax.value_and_grad(
            interpolation_objective, has_aux=True)(
                pts, start, end, log_prob, w_path, w_eq)
        g = jnp.clip(g, -1.0, 1.0)
        t = t + 1
        m = ADAM_B1 * m + (1 - ADAM_B1) * g
        v = ADAM_B2 * v + (1 - ADAM_B2) * g * g
        lr_t = lr * jnp.sqrt(1 - ADAM_B2 ** t) / (1 - ADAM_B1 ** t)
        pts = pts - lr_t * m / (jnp.sqrt(v) + ADAM_EPS)
        hist = jnp.stack([obj, aux["path_length"], aux["step_var"],
                          aux["neg_ll"]])
        return (pts, m, v, t), hist

    carry0 = (init_pts, jnp.zeros_like(init_pts), jnp.zeros_like(init_pts),
              jnp.asarray(0.0))
    (pts, _, _, _), hist = jax.lax.scan(step, carry0, None, length=n_iter)
    return pts, dict(obj=hist[:, 0], path_length=hist[:, 1],
                     step_var=hist[:, 2], neg_ll=hist[:, 3])


def straight_line_init(start, end, n_step):
    """Evenly spaced interior points (notebook cell 18, 'linspace' branch)."""
    pts = jnp.linspace(start, end, n_step + 1, endpoint=False)[1:]
    return pts


def interpolate(config, start, end, log_prob, n_step=8, n_iter=500, lr=1e-2,
                w_path=10.0, w_eq=100.0, init="linear", rng=None,
                sample_fn=None):
    """End-to-end SLP: init -> optimise. Returns (slp_pts, sp_pts, history).

    init="random": interior points drawn by sample_fn(rng, n_step) (the
    notebook samples the fitted prior — demo/interpolate.py wires that up);
    without a sample_fn, standard-normal points in the embedding space
    (dimension from config) are used."""
    if init == "random":
        if rng is None:
            raise ValueError("init='random' needs an rng")
        if sample_fn is not None:
            init_pts = sample_fn(rng, n_step)
        else:
            dim = (config["representation_size"]
                   if config["prior"] in ("ours", "hierarchical")
                   else config["code_size"])
            init_pts = jax.random.normal(rng, (n_step, dim))
    else:
        init_pts = straight_line_init(start, end, n_step)
    slp, hist = optimise_slp(init_pts, start, end, log_prob, n_iter=n_iter,
                             lr=lr, w_path=w_path, w_eq=w_eq)
    return slp, init_pts, hist
