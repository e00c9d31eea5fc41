"""Per-group Adam optimisers with TF1-exact update semantics.

The reference uses up to five separate tf.train.AdamOptimizer instances
(beta1=0.9, beta2=0.95, eps=1e-8), one per variable group, each with its own
learning-rate placeholder (/root/reference/codes/base.py:457-512), and clips
gradients elementwise to [-1, 1] before applying (base.py:514-517).

TF1 Adam differs slightly from optax.adam: the bias correction is folded into
the step size (lr_t = lr * sqrt(1-b2^t)/(1-b1^t)) and epsilon is added to the
*uncorrected* sqrt(v). We reproduce that exactly so fixed-seed loss curves
match the reference's optimiser dynamics. Implemented as pure pytree
functions so the whole multi-group update jits into the one fused train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.95
ADAM_EPS = 1e-8


def adam_init(params):
    zeros = jax.tree.map(jnp.zeros_like, params)
    return dict(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                t=jnp.zeros((), dtype=jnp.int32))


def clip_grads(grads, limit=1.0):
    """Elementwise clip to [-limit, limit] (ClipIfNotNone, base.py:514-517)."""
    return jax.tree.map(lambda g: jnp.clip(g, -limit, limit), grads)


def adam_update(grads, state, params, lr,
                b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS, skip_nonfinite=False):
    """One TF1-style Adam step. Returns (new_params, new_state).

    skip_nonfinite=True drops the whole group update (params, moments and
    the step counter stay put) when any gradient element is NaN/inf — the
    failure-detection guard for long unattended runs (SURVEY.md §5 lists the
    reference as having none)."""
    t = state["t"] + 1
    tf_ = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - b2 ** tf_) / (1.0 - b1 ** tf_)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1.0 - b1) * g, state["m"], grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1.0 - b2) * g * g, state["v"], grads)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + eps), params, m, v)
    if skip_nonfinite:
        finite = jnp.all(jnp.stack([
            jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]))
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(finite, a, b), new, old)
        return keep(new_params, params), dict(
            m=keep(m, state["m"]), v=keep(v, state["v"]),
            t=jnp.where(finite, t, state["t"]))
    return new_params, dict(m=m, v=v, t=t)
