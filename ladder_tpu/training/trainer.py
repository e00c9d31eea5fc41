"""Joint-training driver: epoch rhythm, GM refitting, evaluation, plots,
checkpoints.

Replicates the reference training orchestration
(/root/reference/codes/base.py:844-1010, codes/trainers.py) on top of the
fused jitted train step:

  * per-epoch shuffled batches with the epoch as shuffle seed
  * ae + sigma + prior + inner-sigma updates per batch (one XLA dispatch)
  * standard-gaussian pretraining phase (sg_pretraining), mask activation
    (use_mask_start), fast warm-started GM refit each epoch and accurate
    DP-GMM refit on the accurate_fit cadence (base.py:988-1010)
  * GM parameters re-injected into the next epoch's ELBO as device arrays
    (the reference's placeholder feed, base.py:885-895)
  * prior-sample generation, fixed-test-batch diagnostics, validation loop,
    reconstruction plots, metric npz dump, per-epoch checkpoints

The GM fit itself runs on device (ladder_tpu.ops.gmm) unless
config['gmm_backend']='sklearn' is set for exact-parity experiments.
"""

from __future__ import annotations

import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from ladder_tpu.data.mnist import epoch_batches
from ladder_tpu.models.builder import (
    PRIORS_WITH_GM,
    PRIORS_WITH_INNER_VAE,
    PRIORS_WITH_PRIOR_MODEL,
)
from ladder_tpu.ops.distributions import gmm_cholesky, sample_gmm
from ladder_tpu.ops.gmm import fit_bgmm, fit_bgmm_restarts, fit_em, sklearn_fit
from ladder_tpu.training import schedules
from ladder_tpu.training.losses import identity_gm
from ladder_tpu.training.step import (
    init_state,
    make_eval_step,
    make_forward_fns,
    make_train_step,
)
from ladder_tpu.utils.checkpoint import CheckpointManager, save_gm_prior_info
from ladder_tpu.utils.metrics import MetricsRecorder
from ladder_tpu.utils import plotting


class JointTrainer:
    """Dataset-agnostic core; subclasses provide the batch sources."""

    # single-process default; __init__ re-derives it from
    # jax.process_index() so partially-constructed instances (tests,
    # tooling) keep single-writer semantics
    is_lead = True

    def __init__(self, model, data, config, mesh=None):
        self.model = model
        self.data = data
        self.config = config
        self.mesh = mesh
        self.prior = config["prior"]
        self.plots_enabled = bool(config.get("enable_plots", 1))
        if mesh is not None and getattr(model, "fused_output", False):
            # the fused output-stage kernel is a single-device pallas call;
            # under GSPMD its operands would be gathered rather than
            # partitioned — keep the XLA path for data-parallel runs
            print("fused_output_stage disabled under the device mesh "
                  "(single-device kernel); using the XLA output stage.")
            model.fused_output = False

        # multi-process (jax.distributed) discipline: every process runs
        # the same SPMD program and the same collective-safe save calls;
        # only the lead process touches result/plot/summary files
        self.is_lead = jax.process_index() == 0

        self.rng = jax.random.PRNGKey(config.get("seed", 0))
        self.rng, init_rng = jax.random.split(self.rng)
        self.state = init_state(model, init_rng)
        self.ckpt = CheckpointManager(config)
        self.metrics = MetricsRecorder()

        self.train_step = make_train_step(model)
        self.eval_step = make_eval_step(model)
        self.fwd = make_forward_fns(model)
        # K>1: scan K steps per dispatch (ladder_tpu.training.step.
        # make_train_multi_step) — amortises host dispatch latency on
        # tunneled/remote devices; identical update semantics.
        self.steps_per_call = int(config.get("steps_per_call", 1))
        if self.steps_per_call > 1:
            from ladder_tpu.training.step import make_train_multi_step
            self.train_multi_step = make_train_multi_step(model)

        self.cur_epoch = 0
        self.gm_fast = None       # (weights, means, covs) of the fast fit
        self.gm_final = None      # accurate fit
        self._warm = None         # warm-start state (resp or sklearn model)
        self.output_test = None

        if self.mesh is not None:
            from ladder_tpu.parallel.mesh import shard_state
            self.state = shard_state(self.state, self.mesh)

        self.num_para_list = model.count_params()
        print("Total number of trainable parameters in VAE network is:\n"
              "{}k\n".format(np.around(sum(self.num_para_list) / 1000, 2)))

    # ---- subclass hooks ----------------------------------------------
    def train_batches(self):
        raise NotImplementedError

    def val_batches(self):
        raise NotImplementedError

    def sample_batches(self, n_samples):
        """Batches for GM fitting (the reference keeps pulling from the
        repeating train iterator, base.py:683-709)."""
        raise NotImplementedError

    def test_batch(self):
        raise NotImplementedError

    def n_train_iter(self):
        raise NotImplementedError

    def n_val_iter(self):
        raise NotImplementedError

    def current_lr_ae(self):
        return schedules.lr_ae(self.config, self.cur_epoch)

    # ---- epoch-state helpers -----------------------------------------
    def _next_rng(self):
        self.rng, r = jax.random.split(self.rng)
        return r

    def _place(self, batch):
        """Device placement: shard the batch axis over the mesh when data
        parallel (multi-process: each process contributes its slice of the
        logical global batch), else plain transfer. Batches already on
        device (the prefetching pipeline transfers in its worker thread)
        pass through."""
        if isinstance(batch, jax.Array):
            return batch
        if self.mesh is not None:
            from ladder_tpu.parallel.mesh import place_global_batch
            return place_global_batch(np.asarray(batch), self.mesh)
        return jnp.asarray(batch)

    def _place_stack(self, batches):
        """Stack K batches into [K, B, ...] for the multi-step scan; under a
        mesh the batch axis (axis 1) is sharded, the step axis replicated."""
        if isinstance(batches[0], jax.Array):
            # already placed (prefetcher): stack is a global SPMD op, then
            # reshard to the scan layout — no host round-trip
            x = jnp.stack(batches)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                s = NamedSharding(self.mesh,
                                  P(None, self.mesh.axis_names[0]))
                return jax.device_put(x, s)
            return x
        x = np.stack([np.asarray(b) for b in batches])
        if self.mesh is not None:
            from ladder_tpu.parallel.mesh import place_global_stack
            return place_global_stack(x, self.mesh)
        return jnp.asarray(x)

    def _host(self, arr):
        """Host copy that is safe for sharded global arrays in multi-process
        runs (np.asarray raises on non-fully-addressable arrays). Collective
        when it gathers — call it from every process before any is_lead
        gate."""
        from ladder_tpu.utils.checkpoint import _to_host
        return _to_host(arr)

    def _gm_for_step(self):
        """Device GM pytree fed to the train step (compute_feeddict parity,
        base.py:862-942)."""
        cfg = self.config
        if self.prior == "ours":
            if self.cur_epoch <= cfg["sg_pretraining"] or self.gm_fast is None:
                return identity_gm(cfg["n_mixtures"], cfg["representation_size"])
            w, m, K = self.gm_fast
            return dict(weights=w, means=m, chols=gmm_cholesky(K))
        if self.prior == "GMM":
            if self.cur_epoch == 1 or self.gm_fast is None:
                return identity_gm(cfg["n_mixtures"], cfg["code_size"])
            w, m, K = self.gm_fast
            # +0.01*I jitter on the fitted covariances (base.py:925-933)
            return dict(weights=w, means=m, chols=gmm_cholesky(K, jitter=0.01))
        return None

    def _flags(self):
        cfg = self.config
        if self.prior == "ours":
            use_sg = self.cur_epoch <= cfg["sg_pretraining"]
            use_mask = self.cur_epoch >= cfg["use_mask_start"]
        elif self.prior in ("hierarchical", "vampPrior"):
            use_sg = self.cur_epoch <= cfg["sg_pretraining"]
            use_mask = False
        else:
            use_sg = False
            use_mask = False
        return {"use_sg_prior": jnp.asarray(use_sg),
                "use_mask": jnp.asarray(use_mask)}

    def _do_prior(self):
        cfg = self.config
        return (self.cur_epoch > cfg["sg_pretraining"] - 1
                and self.prior in PRIORS_WITH_PRIOR_MODEL
                and cfg["TRAIN_prior"] == 1)

    def _lrs(self):
        e = self.cur_epoch
        cfg = self.config
        return dict(
            ae=jnp.asarray(self.current_lr_ae(), dtype=jnp.float32),
            sigma=jnp.asarray(schedules.lr_sigma(cfg, e), dtype=jnp.float32),
            prior=jnp.asarray(schedules.lr_prior(cfg, e), dtype=jnp.float32),
            inner_sigma=jnp.asarray(schedules.lr_inner_sigma(cfg, e),
                                    dtype=jnp.float32),
        )

    # ---- training ----------------------------------------------------
    def train(self):
        """Run the remaining epochs. After a full-state restore cur_epoch is
        the last completed epoch (base.py:848-860 saves per epoch), so a
        resume trains exactly num_epochs - cur_epoch more epochs — the total
        across crash+resume equals num_epochs.

        Preemption-safe: on SIGTERM (what cluster schedulers and TPU
        maintenance handlers send) the current epoch finishes, the
        per-epoch checkpoint + full train state are written as usual, and
        train() returns cleanly — rerunning the same command resumes. A
        second SIGTERM aborts immediately (the per-epoch full-state save
        still makes that a clean resume point). The reference has no
        signal handling; kill -9 crash-resume is separately tested."""
        self.start_time = time.time()
        self._session_start_epoch = self.cur_epoch  # for the time estimate
        self._stop_requested = False

        def _request_stop(signum, frame):
            if self._stop_requested:
                raise KeyboardInterrupt("second preemption signal")
            self._stop_requested = True
            print("\nPreemption signal: finishing the current epoch, "
                  "saving, then exiting cleanly (signal again to abort).")

        old_handler = None
        try:  # signal.signal only works in the main thread
            old_handler = signal.signal(signal.SIGTERM, _request_stop)
        except ValueError:
            pass
        try:
            for _ in range(max(0,
                               self.config["num_epochs"] - self.cur_epoch)):
                self.train_epoch()
                if self.prior in PRIORS_WITH_PRIOR_MODEL:
                    self.ckpt.save(self.state, model="joint")
                else:
                    self.ckpt.save(self.state, model="VAE")
                self.save_full_state()
                self.compute_execution_time(self.cur_epoch - 1,
                                            self.config["num_epochs"])
                if self._stop_requested:
                    print(f"Preemption save complete at epoch "
                          f"{self.cur_epoch}/{self.config['num_epochs']}; "
                          f"rerun the same command to resume.")
                    break
        finally:
            if old_handler is not None:
                signal.signal(signal.SIGTERM, old_handler)
            # train()'s artifact contract is 'on disk when it returns':
            # drain any async checkpoint writes (no-op when synchronous)
            self.ckpt.flush()

    def train_epoch(self):
        cfg = self.config
        self.cur_epoch += 1
        print("{}/{}:".format(self.cur_epoch, cfg["num_epochs"]))

        gm = self._gm_for_step()
        flags = self._flags()
        lrs = self._lrs()
        do_prior = self._do_prior()

        from ladder_tpu.utils.profiling import StepTimer, trace
        timer = StepTimer(batch_size=cfg["batch_size"])
        profile_dir = cfg.get("profile_dir") if self.cur_epoch == 1 else None

        train_loss_cur_epoch = 0.0
        n_iter = 0
        # Metric outputs stay on device during the epoch (a per-step
        # np.asarray would force a host sync per step — pure dispatch
        # latency on tunneled/remote devices); one device_get drains them
        # at epoch end. sync_each_step=1 restores per-step timing fidelity.
        sync_each = bool(cfg.get("sync_each_step", 0))
        outs = []
        # one base key per epoch; the jitted step folds its counter in, so
        # there is no per-step host split dispatch
        epoch_rng = self._next_rng()
        sg_ov = (do_prior and self.cur_epoch <= cfg["sg_pretraining"])
        K = self.steps_per_call
        timer.wall_start()
        with trace(profile_dir):
            if K > 1:
                from itertools import islice
                it = iter(self.train_batches())
                while True:
                    chunk = list(islice(it, K))
                    if not chunk:
                        break
                    if len(chunk) == K:
                        timer.start()
                        self.state, outk = self.train_multi_step(
                            self.state, self._place_stack(chunk), epoch_rng,
                            gm, flags, lrs, do_prior, sg_overlap=sg_ov)
                        timer.stop(sync_on=outk if sync_each else None,
                                   n_steps=K)
                        outs.append((K, outk))
                        n_iter += K
                        # span covers every step in the dispatch so
                        # checkpoint indices inside the chunk still fire
                        self.mid_epoch_hook(n_iter - 1, span=K)
                    else:  # remainder of the epoch: single steps
                        for batch in chunk:
                            timer.start()
                            self.state, out = self.train_step(
                                self.state, self._place(batch), epoch_rng,
                                gm, flags, lrs, do_prior, sg_overlap=sg_ov)
                            timer.stop(sync_on=out if sync_each else None)
                            outs.append((1, out))
                            n_iter += 1
                            self.mid_epoch_hook(n_iter - 1)
            else:
                for batch in self.train_batches():
                    timer.start()
                    self.state, out = self.train_step(
                        self.state, self._place(batch), epoch_rng, gm,
                        flags, lrs, do_prior, sg_overlap=sg_ov)
                    timer.stop(sync_on=out if sync_each else None)
                    outs.append((1, out))
                    n_iter += 1
                    self.mid_epoch_hook(n_iter - 1)
            jax.block_until_ready(self.state)
        timer.wall_stop()
        self._timer_summary = timer.report(prefix=f"epoch {self.cur_epoch}: ")

        def _record(out):
            nonlocal train_loss_cur_epoch
            if cfg["TRAIN_VAE"] == 1 and "ae" in out:
                self.metrics.record_ae_step(out["ae"])
                train_loss_cur_epoch += float(out["ae"]["loss_ae"])
            if cfg["TRAIN_sigma"] == 1 and "sigma" in out:
                self.metrics.record_sigma_step(out["sigma"])
            if do_prior and "prior" in out:
                self.metrics.record_prior_step(out["prior"], self.prior)

        # ONE device_get for the whole epoch's metric pytrees (per-item
        # gets would pay a host round-trip per step on remote links)
        for k, out in jax.device_get(outs):
            if k == 1:
                _record(out)
            else:
                for i in range(k):
                    _record(jax.tree.map(lambda a: a[i], out))

        if cfg["TRAIN_VAE"] == 1 and n_iter:
            self.metrics.train_loss_ave_epoch.append(
                train_loss_cur_epoch / n_iter)
            self.metrics.iter_epochs_list.append(
                len(self.metrics.train_loss) - 1)

        # fit a GM in representation or code space (trainers.py:47-48)
        if (self.cur_epoch > cfg["sg_pretraining"] - 1
                and self.prior in PRIORS_WITH_GM):
            self.fit_GM()

        # prior samples (base.py:1147-1168)
        if self.plots_enabled:
            self.generate_samples_from_prior()

        # fixed-test-batch diagnostics
        self.test_step(self.test_batch(), print_result=True)

        # validation loop; the VAE/prior recording gates differ between the
        # reference's two trainers (trainers.py:55-67 vs 175-186) — see the
        # val_vae_enabled/val_prior_enabled hooks
        val_loss_cur_epoch = 0.0
        n_val = 0
        gm = self._gm_for_step()
        run_vae_val = self.val_vae_enabled()
        run_prior_val = (self.cur_epoch > cfg["sg_pretraining"] - 1
                         and self.prior in PRIORS_WITH_PRIOR_MODEL
                         and self.val_prior_enabled())
        # same epoch-lazy pattern as training: no per-batch host sync
        val_outs = []
        for batch in self.val_batches():
            val_outs.append(self.eval_step(
                self.state["params"], self._place(batch), self._next_rng(),
                gm, flags))
        for m in jax.device_get(val_outs):
            if run_vae_val:
                val_loss_cur_epoch += self.metrics.record_val_step(
                    m, "VAE", self.prior)
                n_val += 1
            if run_prior_val:
                self.metrics.record_val_step(m, "prior", self.prior)
        self.append_val_average(val_loss_cur_epoch, n_val)
        if cfg["TRAIN_VAE"] == 1 and self.metrics.train_loss_ave_epoch:
            print("Average overall negative ELBO loss:\ntrain: {:.4f}, "
                  "val: {:.4f}".format(
                      self.metrics.train_loss_ave_epoch[-1],
                      self.metrics.val_loss_ave_epoch[-1]
                      if self.metrics.val_loss_ave_epoch else float("nan")))

        self.epoch_tail_plots()

        # result npz (base.py:791-823); single-writer under multi-process
        if self.is_lead:
            self.metrics.save(cfg, self.num_para_list, self.n_train_iter(),
                              self.n_val_iter())

        # per-epoch scalar summaries (the reference creates summary_dir but
        # never writes to it, SURVEY.md §5; we log one JSON line per epoch)
        if self.is_lead:
            self._write_scalar_summary()

        if self.plots_enabled and self.is_lead:
            if cfg["TRAIN_VAE"] == 1:
                plotting.plot_train_and_val_loss_vae(
                    self.metrics, cfg["result_dir"], cfg["TRAIN_sigma"],
                    cfg["sigma"])
            if (self.cur_epoch > cfg["sg_pretraining"]
                    and self.prior in PRIORS_WITH_PRIOR_MODEL
                    and cfg["TRAIN_prior"] == 1):
                plotting.plot_train_and_val_loss_prior(
                    self.metrics, cfg["result_dir"], self.prior)

    def val_vae_enabled(self):
        """MNIST runs the VAE val_step unconditionally (trainers.py:62);
        CelebA gates it on TRAIN_VAE (trainers.py:180) — overridden there."""
        return True

    def val_prior_enabled(self):
        """Extra per-dataset gate on the prior val record: MNIST has none
        (trainers.py:63-64); CelebA adds TRAIN_prior==1 (trainers.py:183)."""
        return True

    def append_val_average(self, val_loss_sum, n_val):
        """MNIST appends sum/n_val of the recorded VAE val losses
        (trainers.py:66); guarded for an empty val set."""
        if n_val:
            self.metrics.val_loss_ave_epoch.append(val_loss_sum / n_val)

    def mid_epoch_hook(self, idx_iter, span=1):
        """CelebA mid-epoch reconstruction checkpoints (trainers.py:156-158);
        no-op for MNIST. span>1: steps idx_iter-span+1..idx_iter just ran as
        one dispatch — implementations must match checkpoint indices against
        the whole window."""

    def epoch_tail_plots(self):
        """Dataset-specific reconstruction plots after validation."""

    # ---- GM fitting (base.py:681-789, 988-1010) ----------------------
    def _collect_samples(self, n_target, space):
        """Encode ~n_target train samples into t or z space on device."""
        outs = []
        for batch in self.sample_batches(n_target):
            x = self._place(batch)
            if space == "t":
                s = self.fwd["representation_sample"](
                    self.state["params"], x, self._next_rng())
            else:
                s = self.fwd["encode_sample"](
                    self.state["params"], x, self._next_rng())
            outs.append(s)
        return jnp.concatenate(outs, axis=0)

    def _report_active(self, weights):
        from ladder_tpu.ops.gmm import ACTIVE_WEIGHT_THRESHOLD
        w = self._host(weights)
        idx = np.where(w >= ACTIVE_WEIGHT_THRESHOLD)[0]
        if len(idx) == 0:
            print("There are 0 active mixtures.")
        else:
            print("There are {} active mixtures.".format(len(idx)))
            print("The current GM prior estimate has following weights:\n{}"
                  .format(w[idx]))

    def fit_GMM_VI(self, mode="fast", space="z"):
        """Fast warm-started VI fit each epoch; accurate fresh DP fit on
        cadence. Returns the samples used (for the 2-D scatter plots)."""
        cfg = self.config
        bs = cfg["batch_size"]
        n_target = (2000 // bs + 1) * bs if mode == "fast" else \
                   (20000 // bs + 1) * bs
        samples = self._collect_samples(n_target, space)

        if cfg.get("gmm_backend") == "sklearn":
            # host fit: gather the (possibly cross-process-sharded) samples;
            # every process fits the identical gathered set with the same
            # seed, so the result is deterministic-redundant — no broadcast
            # needed (the device backend is SPMD-identical by construction)
            samples_np = self._host(samples)
            if mode == "fast":
                kind = ("dirichlet_distribution" if self.prior == "ours"
                        else "ml")
                fit, model_obj = sklearn_fit(
                    samples_np, cfg["n_mixtures"], mode="fast",
                    space_prior=kind, warm_model=self._warm)
                self._warm = model_obj
                self.gm_fast = (fit.weights, fit.means, fit.covariances)
            else:
                # reference n_init: GM_fit_restart for the t-space DP fit
                # (base.py:743) but hardcoded 1 for the z-space ML fit
                # (base.py:762-767)
                kind = ("dirichlet_process" if self.prior == "ours" else "ml")
                n_init = (cfg["GM_fit_restart"] if self.prior == "ours"
                          else 1)
                fit, _ = sklearn_fit(samples_np, cfg["n_mixtures"],
                                     mode="accurate", space_prior=kind,
                                     n_init=n_init)
                self.gm_final = (fit.weights, fit.means, fit.covariances)
        else:
            if mode == "fast":
                if self.prior == "ours":
                    init_resp = self._resp_from_prev(samples) \
                        if self.gm_fast is not None else None
                    fit, resp = fit_bgmm(
                        self._next_rng(), samples, cfg["n_mixtures"],
                        max_iter=1000, weight_concentration_prior=0.1,
                        dirichlet_process=False, init_resp=init_resp)
                else:  # GMM prior fits max-likelihood EM in z space
                    kw = {}
                    if self.gm_fast is not None:
                        w, m, K = self.gm_fast
                        kw = dict(init_weights=w, init_means=m, init_covs=K)
                    fit = fit_em(self._next_rng(), samples,
                                 cfg["n_mixtures"], max_iter=1000, **kw)
                self.gm_fast = (fit.weights, fit.means, fit.covariances)
            else:
                if self.prior == "ours":
                    fit, _ = fit_bgmm_restarts(
                        self._next_rng(), samples, cfg["n_mixtures"],
                        n_init=cfg["GM_fit_restart"], max_iter=2000,
                        weight_concentration_prior=0.1,
                        dirichlet_process=True)
                else:
                    fit = fit_em(self._next_rng(), samples,
                                 cfg["n_mixtures"], max_iter=2000)
                self.gm_final = (fit.weights, fit.means, fit.covariances)
        which = self.gm_fast if mode == "fast" else self.gm_final
        which_host = tuple(self._host(a) for a in which)  # collective
        if mode == "accurate" and self.is_lead:
            # both backends persist the accurate fit unconditionally, in the
            # reference's order: npz save -> active report -> final print
            # (base.py:769-789); single-writer under multi-process
            save_gm_prior_info(cfg["result_dir"], *which_host)
        self._report_active(which_host[0])
        if mode == "accurate":
            print("Final fitted prior saved.")
        # per-epoch record of the fitted GM (the reference declares these
        # buffers, base.py:568-570; it never writes them — we populate them
        # so post-hoc analysis can track the prior's evolution)
        self.metrics.gmm_weight.append(which_host[0])
        self.metrics.gmm_mean.append(which_host[1])
        self.metrics.gmm_cov.append(which_host[2])
        return samples

    def _resp_from_prev(self, samples):
        """Warm start: responsibilities of the new samples under the previous
        fast fit (sklearn warm_start semantics, base.py:93-99)."""
        from ladder_tpu.ops.gmm import _log_gaussian_prob, _precision_chol
        w, m, K = self.gm_fast
        pc = _precision_chol(K + 1e-6 * jnp.eye(K.shape[-1]))
        logp = _log_gaussian_prob(samples, m, pc) + \
            jnp.log(jnp.maximum(w, 1e-38))[None, :]
        return jax.nn.softmax(logp, axis=1)

    def fit_GM(self):
        cfg = self.config
        if self.prior == "ours":
            samples = self.fit_GMM_VI(mode="fast", space="t")
            if cfg["representation_size"] == 2 and self.plots_enabled:
                self._plot_gm(samples, self.gm_fast, "crude-GM")
            if (self.cur_epoch % cfg["accurate_fit"] == 0
                    or self.cur_epoch == cfg["num_epochs"]):
                samples = self.fit_GMM_VI(mode="accurate", space="t")
                if cfg["representation_size"] == 2 and self.plots_enabled:
                    self._plot_gm(samples, self.gm_final, "accurate-GM")
        elif self.prior == "GMM":
            if self.cur_epoch < cfg["num_epochs"]:
                samples = self.fit_GMM_VI(mode="fast", space="z")
                if cfg["code_size"] == 2 and self.plots_enabled:
                    self._plot_gm(samples, self.gm_fast, "crude-GM")
            else:
                samples = self.fit_GMM_VI(mode="accurate", space="z")
                if cfg["code_size"] == 2 and self.plots_enabled:
                    self._plot_gm(samples, self.gm_final, "accurate-GM")

    def _plot_gm(self, samples, gm, mode):
        # collectives: gather BOTH samples and the gm params before the
        # lead gate — under the jax GMM backend gm_fast/gm_final are
        # device arrays, non-fully-addressable in a multi-process run,
        # and np.asarray inside plotting would raise on the lead process
        samples = self._host(samples)
        gm = tuple(self._host(a) for a in gm)
        if not self.is_lead:
            return
        w, m, K = gm
        for style in ("circle", "density"):
            plotting.plot_prior_distribution(
                samples, w, m, K, self.config["result_dir"],
                self.cur_epoch, mode=mode, style=style)

    # ---- prior sampling / generation (base.py:1065-1168) -------------
    def sample_codes_from_prior(self, n, mode="crude-GM", method=None):
        """Sample n codes z from the configured prior."""
        cfg = self.config
        method = method or self.prior
        rng = self._next_rng()
        if method == "standard_gaussian":
            return jax.random.normal(rng, (n, cfg["code_size"]))
        if method == "GMM":
            w, m, K = self.gm_fast if mode == "crude-GM" else self.gm_final
            return sample_gmm(rng, w, m, gmm_cholesky(K), n)
        if method == "ours":
            w, m, K = self.gm_fast if mode == "crude-GM" else self.gm_final
            t = sample_gmm(rng, w, m, gmm_cholesky(K), n)
            return self.fwd["inner_decode"](self.state["params"], t)
        if method == "hierarchical":
            t = jax.random.normal(rng, (n, cfg["representation_size"]))
            return self.fwd["inner_decode"](self.state["params"], t)
        if method == "vampPrior":
            pseudo = self.model.pseudo_inputs(self.state["params"])
            mean, std = self.fwd["encode"](self.state["params"], pseudo)
            rng_k, rng_eps = jax.random.split(rng)
            k = jax.random.randint(rng_k, (n,), 0, cfg["n_mixtures"])
            eps = jax.random.normal(rng_eps, (n, cfg["code_size"]))
            return mean[k] + std[k] * eps
        raise ValueError(method)

    def generate_samples_from_prior(self, n_sample=10):
        cfg = self.config
        rdir = cfg["result_dir"]
        mode, method = "crude-GM", None
        if self.prior == "ours":
            if self.cur_epoch <= cfg["sg_pretraining"]:
                method = "standard_gaussian"
            elif (self.cur_epoch % cfg["accurate_fit"] == 0
                  or self.cur_epoch == cfg["num_epochs"]):
                mode = "accurate-GM"
        elif self.prior == "GMM":
            if self.cur_epoch >= cfg["num_epochs"]:
                mode = "accurate-GM"
        codes = self.sample_codes_from_prior(n_sample ** 2, mode=mode,
                                             method=method)
        images = self._host(self.fwd["decode"](self.state["params"], codes))
        if not self.is_lead:
            return
        if (method or self.prior) in ("GMM", "ours") :
            filename = os.path.join(
                rdir, f"generated_samples_prior_{self.cur_epoch}_{mode}.pdf")
        else:
            filename = os.path.join(
                rdir, f"generated_samples_prior_{self.cur_epoch}.pdf")
        plotting.plot_generated_samples(images, filename,
                                        n_sample, prior=self.prior)

    # ---- test / diagnostics (base.py:944-986) ------------------------
    def test_step(self, batch_data, print_result=False):
        x = self._place(batch_data)
        gm = self._gm_for_step()
        flags = self._flags()
        rng = self._next_rng()
        m = self.eval_step(self.state["params"], x, rng, gm, flags)
        m = jax.tree.map(np.asarray, m)
        # reconstruct for the recon plots (fresh sample, as the reference's
        # separate decoded fetch)
        z = self.fwd["encode_sample"](self.state["params"], x,
                                      self._next_rng())
        self.output_test = self._host(
            self.fwd["decode"](self.state["params"], z))

        if print_result:
            print("test loss: elbo: {:.4f}, recons_loss_l1: {:.4f}, "
                  "entropy z: {:.4f}, cross entropy z: {:.4f}, "
                  "sigma_regularisor: {:.4f}".format(
                      float(m["elbo"]), float(m["l1_reconstruction_error"]),
                      float(m["entropy_z"]), float(m["crossEntropy_prior"]),
                      float(m["sigma_regularisor"])))
        sigma_mean = float(np.mean(m["sigma"]))
        self.metrics.test_sigma.append(sigma_mean)
        print("current sigma: mean: {:.7f}; pixel mean error: {:.7f}".format(
            sigma_mean, float(m["mean_pixel_error"])))
        if self.prior in PRIORS_WITH_INNER_VAE and print_result:
            print("current z std: {}".format(m["std_dev_code"]))
            print("current t std: {}".format(m["std_dev_representation"]))
            print("current inner VAE sigma: {}".format(m["inner_sigma"]))
            print("current code prediction error per channel: {}".format(
                m["mean_code_error"]))
        elif print_result:
            print("current z std: {}".format(m["std_dev_code"]))
        return m

    # ---- bookkeeping --------------------------------------------------
    def _write_scalar_summary(self):
        """Append one JSON line of epoch scalars to summary_dir/scalars.jsonl
        (timing from the step timer, losses from the metric buffers)."""
        import json

        sdir = self.config.get("summary_dir")
        if not sdir:
            return
        os.makedirs(sdir, exist_ok=True)
        rec = self.metrics
        row = dict(
            epoch=self.cur_epoch,
            lr_ae=float(self.current_lr_ae()),
            train_loss=(rec.train_loss_ave_epoch[-1]
                        if rec.train_loss_ave_epoch else None),
            val_loss=(rec.val_loss_ave_epoch[-1]
                      if rec.val_loss_ave_epoch else None),
            sigma=rec.test_sigma[-1] if rec.test_sigma else None,
            inner_sigma=(rec.code_inner_sigma_train[-1]
                         if rec.code_inner_sigma_train else None),
        )
        row.update({f"timing_{k}": v
                    for k, v in (self._timer_summary or {}).items()})
        with open(os.path.join(sdir, "scalars.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def compute_execution_time(self, cur_epoch, total_epoch):
        current = time.time()
        elapsed = (current - self.start_time) / 60
        print("Already trained for {} min.".format(elapsed))
        # rate from THIS session's epochs only: after a crash-resume,
        # start_time restarts but cur_epoch doesn't (base.py:572-581 has no
        # resume, so the reference never hits this)
        done = max(cur_epoch + 1 - getattr(self, "_session_start_epoch", 0),
                   1)
        remaining_epochs = max(total_epoch - (cur_epoch + 1), 0)
        est = (current - self.start_time) / done * remaining_epochs
        print("Remaining {} min.\n".format(est / 60))

    def save_full_state(self):
        from ladder_tpu.utils.metrics import BUFFER_NAMES
        extra = dict(
            cur_epoch=np.asarray(self.cur_epoch),
            rng=np.asarray(self.rng),
            # metric buffers ride along so a crash-resume's {exp}-result.npz
            # curves concatenate seamlessly with the pre-crash epochs (the
            # reference loses them on restart, base.py:531-570)
            metrics={name: np.asarray(getattr(self.metrics, name))
                     for name in BUFFER_NAMES
                     if len(getattr(self.metrics, name))},
        )
        if self.gm_fast is not None:
            extra.update(gm_fast_w=self._host(self.gm_fast[0]),
                         gm_fast_m=self._host(self.gm_fast[1]),
                         gm_fast_K=self._host(self.gm_fast[2]))
        if self.gm_final is not None:
            extra.update(gm_final_w=self._host(self.gm_final[0]),
                         gm_final_m=self._host(self.gm_final[1]),
                         gm_final_K=self._host(self.gm_final[2]))
        # collective-safe single-writer: every process calls (the state
        # gather is a collective), process 0 writes (utils/checkpoint.py)
        self.ckpt.save_full(self.state, extra)

    def restore(self):
        """Reference startup restore (train.py:63-66) + full-state resume."""
        full = self.ckpt.load_full(self.state)
        if full is not None:
            self.state, extra = full
            if self.mesh is not None:
                # load_full returns host arrays; re-apply the mesh placement
                # so a resumed run keeps the TP/ZeRO layout (on a 1-D data
                # mesh this is the replicated placement)
                from ladder_tpu.parallel.mesh import shard_state
                self.state = shard_state(self.state, self.mesh)
            self.cur_epoch = int(extra.get("cur_epoch", 0))
            if "rng" in extra:
                self.rng = jnp.asarray(extra["rng"])
            if "gm_fast_w" in extra:
                self.gm_fast = (jnp.asarray(extra["gm_fast_w"]),
                                jnp.asarray(extra["gm_fast_m"]),
                                jnp.asarray(extra["gm_fast_K"]))
            if "gm_final_w" in extra:
                self.gm_final = (jnp.asarray(extra["gm_final_w"]),
                                 jnp.asarray(extra["gm_final_m"]),
                                 jnp.asarray(extra["gm_final_K"]))
            for name, arr in (extra.get("metrics") or {}).items():
                arr = np.asarray(arr)
                vals = arr.tolist() if arr.ndim <= 1 else list(arr)
                setattr(self.metrics, name, vals)
            print("Full train state restored (epoch {}).".format(
                self.cur_epoch))
            return
        self.state = self.ckpt.load(self.state, model="VAE")
        if self.prior in PRIORS_WITH_PRIOR_MODEL:
            self.state = self.ckpt.load(self.state, model="prior")
        if self.mesh is not None:
            from ladder_tpu.parallel.mesh import shard_state
            self.state = shard_state(self.state, self.mesh)


class MNISTTrainer(JointTrainer):
    """trainers.py:12-127 (MNISTTrainer_joint_training)."""

    def __init__(self, model, data, config, mesh=None):
        super().__init__(model, data, config, mesh)
        self._test_batch = self.data.test_set["image"]
        if self.plots_enabled and self.is_lead:
            plotting.plot_ground_truth_test_set(
                self._test_batch, config["result_dir"], config["batch_size"])

    def _prefetched(self, images):
        """Background-thread device transfer of upcoming batches (double
        buffered) — overlaps the host->HBM copy with the device step."""
        from ladder_tpu.data.celeba import Prefetcher
        bs = self.config["batch_size"]
        n = images.shape[0] // bs
        gen = epoch_batches(images, bs, self.cur_epoch)
        mesh = self.mesh

        def fetch(i, _gen=gen):
            batch = next(_gen)
            if mesh is not None:
                from ladder_tpu.parallel.mesh import place_global_batch
                return place_global_batch(batch, mesh)
            return jax.device_put(batch)

        return iter(Prefetcher(fetch, range(n)))

    def train_batches(self):
        return self._prefetched(self.data.train_set["image"])

    def val_batches(self):
        return self._prefetched(self.data.val_set["image"])

    def sample_batches(self, n_samples):
        bs = self.config["batch_size"]
        n_batch = n_samples // bs
        gen = epoch_batches(self.data.train_set["image"], bs,
                            epoch_seed=self.cur_epoch * 7919 + 1)
        for i, b in enumerate(gen):
            if i >= n_batch:
                return
            yield b

    def test_batch(self):
        return self._test_batch

    def n_train_iter(self):
        return self.data.n_train // self.config["batch_size"]

    def n_val_iter(self):
        return self.data.n_val // self.config["batch_size"]

    def epoch_tail_plots(self):
        if self.plots_enabled and self.is_lead and self.output_test is not None:
            plotting.plot_reconstructed_data(
                self.output_test, self.config["result_dir"], self.cur_epoch,
                title_attribs=None, narrow_space=True)
