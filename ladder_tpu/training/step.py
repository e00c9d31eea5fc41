"""The fused train step: every per-batch optimiser update in ONE jitted call.

The reference drives 3-4 chained sess.run calls per batch (ae update, sigma
update, prior update, inner-sigma update — /root/reference/codes/base.py:
583-641), each a separate graph execution with its own fresh z/t samples and
a host round-trip. Here the same sequential semantics — group k+1 sees the
parameters group k just wrote, and every sub-step draws fresh samples — run
inside a single XLA program: one dispatch, zero host synchronisation, all
intermediate state in HBM.

Group ordering and gating replicate base.py + trainers.py:
  1. ae     : d(loss_ae)/d(encoder,decoder)   [TRAIN_VAE]
  2. sigma  : d(loss_ae)/d(sigma)             [TRAIN_sigma]
  3. prior  : d(loss_prior)/d(prior)          [TRAIN_prior, after sg phase]
  4. inner  : d(loss_prior)/d(inner_sigma)    [TRAIN_inner_sigma]
  5. z_std  : d(decoded_z_std_loss)/d(prior)  [TRAIN_decoded_z_std]
with elementwise +-1 gradient clipping then TF1-style Adam per group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import PRIORS_WITH_INNER_VAE, PRIORS_WITH_PRIOR_MODEL
from ladder_tpu.training.losses import compute_loss
from ladder_tpu.training.optim import adam_init, adam_update, clip_grads

# metrics small enough to return from every train step
_SCALAR_KEYS = (
    "loss_ae", "elbo", "l1_reconstruction_error", "l2_reconstruction_error",
    "entropy_z", "crossEntropy_prior", "sigma_regularisor", "sigma",
    "mean_pixel_error", "reconstruction_likelihood", "crossEntropy_prior_sg",
    "elbo_prior", "loss_prior", "code_l1_reconstruction_error",
    "code_reconstruction_likelihood", "entropy_t",
    "crossEntropy_representation", "inner_sigma", "mean_code_error",
    "std_dev_code", "std_dev_representation", "decoded_z_std_loss",
)


def _small(metrics):
    return {k: metrics[k] for k in _SCALAR_KEYS if k in metrics}


def _subset(params, keys):
    return {k: params[k] for k in keys if k in params}


def group_keys(config):
    """Optimiser-group -> top-level param keys (base.py:415-455)."""
    groups = {"ae": ("encoder", "decoder"), "sigma": ("sigma",)}
    if config["prior"] in PRIORS_WITH_PRIOR_MODEL:
        groups["prior"] = ("prior",)
    if (config["prior"] in PRIORS_WITH_INNER_VAE
            and config["TRAIN_inner_sigma"] == 1):
        groups["inner_sigma"] = ("inner_sigma",)
    if (config["prior"] in PRIORS_WITH_INNER_VAE
            and config["TRAIN_decoded_z_std"] == 1):
        groups["z_std"] = ("prior",)
    return groups


def init_state(model, rng):
    """Initial TrainState pytree: grouped params + per-group Adam state."""
    params = model.init(rng)
    groups = group_keys(model.config)
    opt = {name: adam_init(_subset(params, keys))
           for name, keys in groups.items()}
    return dict(params=params, opt=opt, step=jnp.zeros((), dtype=jnp.int32))


def _apply_update(cfg, grads, opt_state, group, lr):
    """Clipped TF1-Adam update for one optimiser group. On TPU (and unless
    the skip_nonfinite guard is on) the whole update — clip, moments, step —
    runs as the single-pass Pallas kernel (ops/pallas_adam.py); elsewhere
    the jnp path in training/optim.py. Identical math either way."""
    skip = bool(cfg.get("skip_nonfinite_updates", 0))
    if (cfg.get("fused_adam", 0) and not skip
            and jax.default_backend() == "tpu"):
        from ladder_tpu.ops.pallas_adam import adam_update_fused
        from ladder_tpu.training.optim import ADAM_B1, ADAM_B2, ADAM_EPS
        return adam_update_fused(grads, opt_state, group, lr,
                                 ADAM_B1, ADAM_B2, ADAM_EPS)
    return adam_update(clip_grads(grads), opt_state, group, lr,
                       skip_nonfinite=skip)


def _grad_step(model, params, opt_state, keys, batch, rng, gm, flags, lr,
               loss_selector):
    """Differentiate the selected scalar wrt the param subset and apply one
    clipped Adam update. Returns (params, opt_state, metrics)."""

    def loss_fn(group):
        p = {**params, **group}
        loss_ae, metrics = compute_loss(model, p, batch, rng, gm, flags)
        return loss_selector(loss_ae, metrics), metrics

    group = _subset(params, keys)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(group)
    new_group, new_opt = _apply_update(model.config, grads, opt_state,
                                       group, lr)
    return {**params, **new_group}, new_opt, metrics


def make_train_step(model, jit=True):
    """Build train_step(state, batch, rng, gm, flags, lrs, do_prior).

    do_prior is static (flips once per run at the sg_pretraining boundary,
    trainers.py:39); gm/flags/lrs are traced so epoch-varying values never
    recompile.

    config['fused_train_step'] selects the update semantics:
      1 (default): the reference's sequential sub-steps — group k+1 sees
        group k's fresh parameters and every sub-step draws fresh samples —
        fused into one XLA program (3-4 forward+backward passes).
      2: single-pass — ONE forward+backward produces every group's gradient.
        This is exact, not an approximation: for each group that trains on
        loss_prior, grad(loss_ae, group) == grad(loss_prior, group), because
        loss_ae = -elbo contains -elbo_prior as its cross-entropy term
        (base.py:318-320, 399-412) and loss_prior = -elbo_prior (resp.
        loss_prior = loss_ae for vampPrior, base.py:408-412). The groups then
        update simultaneously at the same parameter point (standard
        simultaneous-SGD semantics) instead of sequentially. ~3x faster;
        production default for benchmarks. Not available with
        TRAIN_decoded_z_std (its loss differs).
    """
    cfg = model.config
    if cfg.get("fused_train_step", 1) == 2:
        if cfg["TRAIN_decoded_z_std"] == 1:
            raise ValueError("fused_train_step=2 is incompatible with "
                             "TRAIN_decoded_z_std=1; use mode 1")
        return _make_single_pass_step(model, jit)

    def train_step(state, batch, rng, gm, flags, lrs, do_prior,
                   sg_overlap=False):
        # sg_overlap is only meaningful for the single-pass mode; the
        # sequential sub-steps differentiate loss_prior directly.
        del sg_overlap
        # Derive the per-step stream on device from the step counter, so
        # callers pass one base rng per epoch instead of dispatching a
        # host-side split program every step (dispatch latency dominates on
        # tunneled/remote devices).
        rng = jax.random.fold_in(rng, state["step"])
        params = state["params"]
        opt = dict(state["opt"])
        rngs = jax.random.split(rng, 5)
        out = {}

        if cfg["TRAIN_VAE"] == 1:
            params, opt["ae"], m = _grad_step(
                model, params, opt["ae"], ("encoder", "decoder"), batch,
                rngs[0], gm, flags, lrs["ae"], lambda L, _: L)
            out["ae"] = _small(m)

        if cfg["TRAIN_sigma"] == 1:
            params, opt["sigma"], m = _grad_step(
                model, params, opt["sigma"], ("sigma",), batch,
                rngs[1], gm, flags, lrs["sigma"], lambda L, _: L)
            out["sigma"] = {"sigma": m["sigma"]}

        if (do_prior and cfg["prior"] in PRIORS_WITH_PRIOR_MODEL
                and cfg["TRAIN_prior"] == 1):
            params, opt["prior"], m = _grad_step(
                model, params, opt["prior"], ("prior",), batch,
                rngs[2], gm, flags, lrs["prior"],
                lambda L, met: met["loss_prior"])
            out["prior"] = _small(m)

            if (cfg["prior"] in PRIORS_WITH_INNER_VAE
                    and cfg["TRAIN_inner_sigma"] == 1):
                params, opt["inner_sigma"], m = _grad_step(
                    model, params, opt["inner_sigma"], ("inner_sigma",), batch,
                    rngs[3], gm, flags, lrs["inner_sigma"],
                    lambda L, met: met["loss_prior"])

            if (cfg["prior"] in PRIORS_WITH_INNER_VAE
                    and cfg["TRAIN_decoded_z_std"] == 1):
                params, opt["z_std"], m = _grad_step(
                    model, params, opt["z_std"], ("prior",), batch,
                    rngs[4], gm, flags, lrs["prior"],
                    lambda L, met: met["decoded_z_std_loss"])

        new_state = dict(params=params, opt=opt, step=state["step"] + 1)
        return new_state, out

    if jit:
        return jax.jit(train_step,
                       static_argnames=("do_prior", "sg_overlap"),
                       donate_argnums=(0,))
    return train_step


def _make_single_pass_step(model, jit=True):
    """One forward+backward for all optimiser groups (see make_train_step)."""
    cfg = model.config
    groups = group_keys(cfg)

    def active_groups(do_prior):
        names = []
        if cfg["TRAIN_VAE"] == 1:
            names.append("ae")
        if cfg["TRAIN_sigma"] == 1:
            names.append("sigma")
        if (do_prior and cfg["prior"] in PRIORS_WITH_PRIOR_MODEL
                and cfg["TRAIN_prior"] == 1):
            names.append("prior")
            if (cfg["prior"] in PRIORS_WITH_INNER_VAE
                    and cfg["TRAIN_inner_sigma"] == 1):
                names.append("inner_sigma")
        return names

    def train_step(state, batch, rng, gm, flags, lrs, do_prior,
                   sg_overlap=False):
        """sg_overlap (static): True only for the epoch where prior training
        and the standard-gaussian pretraining switch coincide
        (cur_epoch == sg_pretraining; trainers.py:39 vs base.py:868). There
        loss_ae's cross-entropy is ce_sg — the single backward of loss_ae
        carries no elbo_prior gradient — so the prior groups take a second,
        explicit backward of loss_prior for that one epoch."""
        rng = jax.random.fold_in(rng, state["step"])  # see sequential mode
        params = state["params"]
        opt = dict(state["opt"])
        names = active_groups(do_prior)
        prior_names = [n for n in names if n in ("prior", "inner_sigma")]
        main_names = names
        if sg_overlap and prior_names:
            main_names = [n for n in names if n not in prior_names]
        all_keys = tuple(dict.fromkeys(
            k for n in main_names for k in groups[n]))

        def loss_fn(sub):
            p = {**params, **sub}
            loss_ae, metrics = compute_loss(model, p, batch, rng, gm, flags)
            return loss_ae, metrics

        sub = _subset(params, all_keys)
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(sub)

        new_params = dict(params)
        for name in main_names:
            keys = groups[name]
            g = _subset(grads, keys)
            p = _subset(params, keys)
            upd, opt[name] = _apply_update(cfg, g, opt[name], p, lrs[name])
            new_params.update(upd)

        if sg_overlap and prior_names:
            prior_keys = tuple(dict.fromkeys(
                k for n in prior_names for k in groups[n]))

            def prior_loss_fn(sub):
                p = {**params, **sub}
                _, m = compute_loss(model, p, batch, rng, gm, flags)
                return m["loss_prior"], m

            psub = _subset(params, prior_keys)
            (_, _), pgrads = jax.value_and_grad(
                prior_loss_fn, has_aux=True)(psub)
            for name in prior_names:
                keys = groups[name]
                g = _subset(pgrads, keys)
                p = _subset(params, keys)
                upd, opt[name] = _apply_update(cfg, g, opt[name], p,
                                               lrs[name])
                new_params.update(upd)

        out = {}
        small = _small(metrics)
        if "ae" in names:
            out["ae"] = small
        if "sigma" in names:
            out["sigma"] = {"sigma": metrics["sigma"]}
        if "prior" in names:
            out["prior"] = small
        new_state = dict(params=new_params, opt=opt, step=state["step"] + 1)
        return new_state, out

    if jit:
        return jax.jit(train_step,
                       static_argnames=("do_prior", "sg_overlap"),
                       donate_argnums=(0,))
    return train_step


def make_train_multi_step(model, jit=True):
    """K fused train steps in ONE dispatch: lax.scan over a [K, B, ...]
    batch stack. Amortises host->device dispatch latency (measured ~1.4 ms
    per dispatch over a tunneled v5e; zero-cost on local hardware) and lets
    XLA pipeline consecutive steps. Semantics are identical to calling the
    single step K times: the per-step rng stream comes from
    fold_in(rng, state.step), which increments inside the scan.

    Returned metrics pytrees carry a leading K axis.

    config['scan_unroll'] (default 1) unrolls the scan body N-fold: XLA then
    schedules N consecutive steps as one block and can overlap the tail of
    step k with the head of step k+1 (the per-step intra-schedule gaps
    docs/DESIGN.md §6e measured). Semantics identical at any unroll.

    config['donate_batch_stack'] (default off) additionally donates the
    [K, B, ...] input stack so XLA may reuse its HBM for temporaries. The
    trainer builds a fresh stack per dispatch so donation is safe there;
    callers that reuse a stack across calls (bench.py's default loop) must
    leave it off or copy the master stack per call.
    """
    inner = make_train_step(model, jit=False)
    unroll = int(model.config.get("scan_unroll", 1))
    donate = (0, 1) if model.config.get("donate_batch_stack") else (0,)

    def multi_step(state, batches, rng, gm, flags, lrs, do_prior,
                   sg_overlap=False):
        def body(carry, batch):
            new_state, out = inner(carry, batch, rng, gm, flags, lrs,
                                   do_prior, sg_overlap=sg_overlap)
            return new_state, out

        return jax.lax.scan(body, state, batches, unroll=unroll)

    if jit:
        return jax.jit(multi_step,
                       static_argnames=("do_prior", "sg_overlap"),
                       donate_argnums=donate)
    return multi_step


def make_eval_step(model, jit=True):
    """Loss/metric evaluation without updates (val_step / test_step,
    base.py:643-679, 944-986). Returns the small-metric dict."""

    def eval_step(params, batch, rng, gm, flags):
        _, metrics = compute_loss(model, params, batch, rng, gm, flags)
        return _small(metrics)

    return jax.jit(eval_step) if jit else eval_step


def make_forward_fns(model):
    """Jitted pure inference helpers used by trainers/demos. Image inputs
    may be uint8 (the CelebA pipeline's wire format) — normalised here
    exactly as compute_loss does, so encodings never depend on callers
    remembering the /255 (losses.py:63-64; today the CelebA encoder's
    conv->BatchNorm head happens to be scale/shift-invariant, but that is
    an architectural accident no caller should rely on)."""

    def _norm(x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) * (1.0 / 255.0)
        return x

    @jax.jit
    def encode(params, x):
        return model.encode(params, _norm(x))

    @jax.jit
    def decode(params, z):
        return model.decode(params, z)

    @jax.jit
    def encode_sample(params, x, rng):
        from ladder_tpu.ops.distributions import sample_diag_gaussian
        mean, std = model.encode(params, _norm(x))
        return sample_diag_gaussian(rng, mean, std)

    fns = dict(encode=encode, decode=decode, encode_sample=encode_sample)

    if model.inner_encoder is not None:
        @jax.jit
        def inner_encode(params, z):
            return model.inner_encode(params, z)

        @jax.jit
        def inner_decode(params, t):
            return model.inner_decode(params, t)[0]

        @jax.jit
        def representation_sample(params, x, rng):
            from ladder_tpu.ops.distributions import sample_diag_gaussian
            r1, r2 = jax.random.split(rng)
            mean, std = model.encode(params, _norm(x))
            z = sample_diag_gaussian(r1, mean, std)
            t_mean, t_std = model.inner_encode(params, z)
            return sample_diag_gaussian(r2, t_mean, t_std)

        fns.update(inner_encode=inner_encode, inner_decode=inner_decode,
                   representation_sample=representation_sample)
    return fns
