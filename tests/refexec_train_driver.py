"""Execute the REFERENCE's own TRAIN OPS (read-only, from /root/reference)
side-by-side-ably: restore a checkpoint produced by OUR exporter, then run
the reference's per-batch training protocol — sess.run(train_step_ae), then
train_step_sigma(, train_step_prior, train_step_inner_sigma), each a
separate graph execution exactly as BaseTrain.train_step_ae /
train_step_prior drive them (/root/reference/codes/base.py:583-641,
trainers.py:33-40) — for S steps, and dump the full loss/sigma trajectories
plus the final weights.

Covers EVERY prior family (base.py:257-413):
  prior              sub-steps                      sample sites
  ours               ae, sigma, prior, inner_sigma  z, t, MC(t)
  hierarchical       ae, sigma, prior, inner_sigma  z, t
  vampPrior          ae, sigma, prior               z, MC(z)
  GMM                ae, sigma                      z, MC(z)
  standard_gaussian  ae, sigma                      z

What executes as genuine reference code: the whole forward graph (as in
refexec_driver.py), define_loss, compute_gradients — i.e. the reference's
OWN tf.train.AdamOptimizer(beta1=0.9, beta2=0.95) instances, its
ClipIfNotNone +-1 clipping, its sequential update order (base.py:457-517),
and its lr schedules (base.py:589, 601, 610, 633-636).

The ONLY substitution beyond refexec_driver's shims: the shim tfp
MultivariateNormalDiag.sample() reads eps from a placeholder instead of
tf.random.normal, fed from the npz; the JAX side consumes the identical
eps stream, so every divergence in the recorded trajectories is framework
math, not noise. Every sub-step re-executes the graph with fresh noise on
both sides, exactly the reference's sess.run protocol.

Usage: python refexec_train_driver.py --config cfg.json --data data.npz \
           --out out.npz
data.npz:
  batches  [S, B, H, W, C]     one batch per step
  eps_z    [S, n_sub, B, code] per step x sub-step
  eps_t    [S, n_sub, B, rep]          (ours / hierarchical)
  eps_mc   [S, n_sub, L, B, rep|code]  (ours: rep; vampPrior/GMM: code)
  gm_means [K, d], gm_cov [K, d, d], gm_weights [K]
           (ours: d=rep, t-space; GMM: d=code, z-space; unused otherwise)
  steps_sg []                  steps 0..steps_sg-1 run in the first phase
           (ours/hierarchical/vampPrior: cur_epoch == sg_pretraining with
           use_standard_gaussian_prior=True, the sg-overlap epoch of
           trainers.py:39 vs base.py:868; GMM: cur_epoch 1 with the
           identity GM feed of base.py:913-921). The rest run one epoch
           later with the npz GM / the learned prior.

COMPOSED GM-CYCLE mode (optional keys; 'ours' and 'GMM' priors): when
  fit_batches [F, B, H, W, C]  is present, the signature LaDDer rhythm runs
  in full: after the sg-phase steps the driver encodes every fit batch
  through the reference's own graph (representation_sample for 'ours',
  code_sample for 'GMM' — the exact fetch-and-feed protocol of
  /root/reference/codes/base.py:683-709, eps fed from
  eps_fit_z [F, B, code] / eps_fit_t [F, B, rep]), fits the reference's
  OWN sklearn mixture object model.GM_prior_training (created verbatim by
  define_GM_prior, base.py:88-106; .fit() is base.py:710) after seeding
  numpy's global RNG with fit_seed [] (sklearn inits from the global
  RandomState when random_state=None), and the remaining steps feed
  GM_prior_training.means_/covariances_/weights_ exactly as
  compute_feeddict does after sg_pretraining (base.py:885-895). The npz
  gm_* keys are ignored in phase 2 and the output gains fit_w / fit_m /
  fit_K / fit_samples.
"""

import argparse
import json
import os
import sys

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from refexec_driver import install_shims  # noqa: E402

SITES = {
    "ours": ("z", "t", "mc"),
    "hierarchical": ("z", "t"),
    "vampPrior": ("z", "mc"),
    "GMM": ("z", "mc"),
    "standard_gaussian": ("z",),
}

# record lists per family, keyed like the BaseTrain buffers
COMMON_KEYS = ("loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
               "crossEntropy_prior", "sigma_regularisor", "sigma")
INNER_KEYS = ("elbo_prior", "code_l1_reconstruction_error",
              "code_reconstruction_likelihood", "entropy_t",
              "crossEntropy_representation", "inner_sigma")
VAMP_KEYS = ("loss_prior", "crossEntropy_prior_substep")


def feed_eps_placeholders(tf1):
    """Swap the shim MultivariateNormalDiag for one whose sample() reads
    eps from a placeholder (registered in graph-construction order)."""
    import tensorflow_probability as tfp  # the shim installed above

    dist = tfp.distributions
    base_cls = dist.MultivariateNormalDiag
    eps_phs = []

    class EpsFedMVNDiag(base_cls):
        def sample(self, n=None):
            static = self.loc.shape.as_list()          # e.g. [None, D]
            shape = static if n is None else [int(n)] + static
            ph = tf1.placeholder(tf1.float32, shape,
                                 name=f"eps_feed_{len(eps_phs)}")
            eps_phs.append(ph)
            return self.loc + self.scale * ph

    dist.MultivariateNormalDiag = EpsFedMVNDiag
    return eps_phs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    tf1 = install_shims()
    eps_phs = feed_eps_placeholders(tf1)
    sys.path.insert(0, "/root/reference")
    import codes.models as ref_models  # noqa: E402  (reference code)

    with open(args.config) as f:
        config = json.load(f)
    prior = config["prior"]
    sites = SITES[prior]
    model_cls = {
        "mnist_digit": ref_models.MNISTModel_digit,
        "mnist_fashion": ref_models.MNISTModel_fashion,
        "celeba": ref_models.CelebAModel_densenet,
    }[config.get("exp_name", "mnist_digit")]
    model = model_cls(config)
    # creation order: z (models.py:100), then t (base.py:167, inner VAE)
    # and/or the MC site (base.py:311/364); define_vampPrior's per-component
    # MVNDiags never call sample()
    assert len(eps_phs) == len(sites), (len(eps_phs), sites)
    ph = dict(zip(sites, eps_phs))

    data = np.load(args.data)
    batches = data["batches"]
    S = batches.shape[0]
    steps_sg = int(data["steps_sg"])
    n_mix, gm_dim = data["gm_means"].shape
    code = config["code_size"]
    rep = config["representation_size"]
    sgp = config["sg_pretraining"]
    joint = prior in ("ours", "hierarchical", "vampPrior")

    ckdir = config["checkpoint_dir"]
    stubs = ["vae-model.meta"] + (["prior-model.meta"] if joint else [])
    for stub in stubs:
        open(os.path.join(ckdir, stub), "a").close()

    traj_keys = COMMON_KEYS
    if prior in ("ours", "hierarchical"):
        traj_keys = traj_keys + INNER_KEYS
    elif prior == "vampPrior":
        traj_keys = traj_keys + VAMP_KEYS
    traj = {k: [] for k in traj_keys}

    # composed GM-cycle mode: phase 2 feeds the reference's OWN fit of its
    # own encodings instead of the npz GM (base.py:885-895); populated by
    # run_reference_fit() between the phases
    cycle = "fit_batches" in data
    fitted = {}

    def build_feed(s, in_sg, cur_epoch):
        """compute_feeddict per family (base.py:863-942)."""
        feed = {
            model.original_signal: batches[s],
            model.is_code_input: False,
            model.code_input: np.zeros((1, code), np.float32),
        }
        if prior in ("ours", "hierarchical"):
            feed[model.is_outer_VAE_input] = True
            feed[model.customised_inner_VAE_input] = np.zeros(
                (1, code), np.float32)
            feed[model.is_representation_input] = False
            feed[model.representation_input] = np.zeros((1, rep), np.float32)
            feed[model.use_standard_gaussian_prior] = in_sg
        if prior == "ours":
            feed[model.use_mask] = cur_epoch >= config["use_mask_start"]
            if in_sg:
                feed[model.prior_mean] = np.zeros((n_mix, gm_dim), np.float32)
                feed[model.prior_cov] = np.tile(
                    np.eye(gm_dim, dtype=np.float32), (n_mix, 1, 1))
                feed[model.prior_weight] = np.full((n_mix,), 1.0 / n_mix,
                                                   np.float32)
            elif cycle:
                feed[model.prior_mean] = fitted["m"]
                feed[model.prior_cov] = fitted["K"]
                feed[model.prior_weight] = fitted["w"]
            else:
                feed[model.prior_mean] = data["gm_means"]
                feed[model.prior_cov] = data["gm_cov"]
                feed[model.prior_weight] = data["gm_weights"]
        elif prior == "vampPrior":
            feed[model.use_standard_gaussian_prior] = in_sg
        elif prior == "GMM":
            # base.py:913-933: identity GM on epoch 1, the fitted GM after
            if in_sg:
                feed[model.prior_mean] = np.zeros((n_mix, gm_dim), np.float32)
                feed[model.prior_cov] = np.tile(
                    np.eye(gm_dim, dtype=np.float32), (n_mix, 1, 1))
                feed[model.prior_weight] = np.full((n_mix,), 1.0 / n_mix,
                                                   np.float32)
            elif cycle:
                # base.py:925-933: +0.01*I jitter on the fitted covariances
                feed[model.prior_mean] = fitted["m"]
                feed[model.prior_cov] = (
                    fitted["K"]
                    + 0.01 * np.eye(gm_dim, dtype=np.float32)[None])
                feed[model.prior_weight] = fitted["w"]
            else:
                feed[model.prior_mean] = data["gm_means"]
                feed[model.prior_cov] = data["gm_cov"]
                feed[model.prior_weight] = data["gm_weights"]
        return feed

    def run_reference_fit(sess):
        """The reference's fast-fit protocol between the two phases: encode
        every fit batch with the graph's OWN sample nodes
        (base.py:683-709), then model.GM_prior_training.fit(samples)
        (base.py:710 — the sklearn object define_GM_prior created)."""
        space = "t" if prior == "ours" else "z"
        fetch = (model.representation_sample if space == "t"
                 else model.code_sample)
        chunks = []
        for i in range(data["fit_batches"].shape[0]):
            f = {model.original_signal: data["fit_batches"][i],
                 model.is_code_input: False,
                 model.code_input: np.zeros((1, code), np.float32),
                 ph["z"]: data["eps_fit_z"][i]}
            if space == "t":
                f.update({model.is_outer_VAE_input: True,
                          model.customised_inner_VAE_input: np.zeros(
                              (1, code), np.float32),
                          model.is_representation_input: False,
                          model.representation_input: np.zeros(
                              (1, rep), np.float32),
                          ph["t"]: data["eps_fit_t"][i]})
            chunks.append(sess.run(fetch, feed_dict=f))
        samples = np.concatenate(chunks, axis=0)
        # the reference never sets random_state: sklearn inits (kmeans)
        # from numpy's global RandomState — pin it so both sides of the
        # parity harness fit from the same initialisation
        np.random.seed(int(data["fit_seed"]))
        model.GM_prior_training.fit(samples)
        fitted["w"] = model.GM_prior_training.weights_
        fitted["m"] = model.GM_prior_training.means_
        fitted["K"] = model.GM_prior_training.covariances_
        return samples

    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        model.load(sess, "VAE")
        if joint:
            model.load(sess, "prior")

        fit_samples = None
        for s in range(S):
            in_sg = s < steps_sg
            if cycle and s == steps_sg:
                # the epoch boundary: fit_GM runs between the epochs
                # (trainers.py:47-48), feeding the next epoch's steps
                fit_samples = run_reference_fit(sess)
            # GMM has no sg-overlap epoch: phase 1 IS epoch 1
            cur_epoch = (1 if in_sg else 2) if prior == "GMM" else \
                        (sgp if in_sg else sgp + 1)
            feed = build_feed(s, in_sg, cur_epoch)

            def sub(i, extra, fetches, op, feed=feed, s=s):
                f = dict(feed)
                for site, p in ph.items():
                    f[p] = data[f"eps_{site}"][s, i]
                f.update(extra)
                return sess.run(fetches + [op], feed_dict=f)[:-1]

            # sub-step 1: ae (train_step_ae body, base.py:583-599)
            lr_ae = config["learning_rate_ae"] * 0.99 ** (cur_epoch - 1)
            vals = sub(0, {model.lr_ae: lr_ae},
                       [model.loss_ae, model.elbo,
                        model.l1_reconstruction_error, model.entropy_z,
                        model.crossEntropy_prior, model.sigma_regularisor],
                       model.train_step_ae)
            for k, v in zip(("loss_ae", "elbo", "l1_reconstruction_error",
                             "entropy_z", "crossEntropy_prior",
                             "sigma_regularisor"), vals):
                traj[k].append(v)

            # sub-step 2: sigma (base.py:601-606)
            lr_sigma = (config["learning_rate_sigma"]
                        * 0.99 ** (cur_epoch - 1))
            (sigma,) = sub(1, {model.lr_sigma: lr_sigma}, [model.sigma],
                           model.train_step_sigma)
            traj["sigma"].append(sigma)

            if not joint:
                continue  # standard_gaussian / GMM: VAE-only training

            # sub-step 3: prior (train_step_prior, base.py:608-629);
            # trainers.py:39 gates on cur_epoch > sg_pretraining-1, true
            # for both phases here
            lr_prior = (config["learning_rate_prior"]
                        * 1.01 ** (cur_epoch - 1))
            if prior in ("ours", "hierarchical"):
                vals = sub(2, {model.lr_prior: lr_prior},
                           [model.elbo_prior,
                            model.code_l1_reconstruction_error,
                            model.code_reconstruction_likelihood,
                            model.entropy_t,
                            model.crossEntropy_representation,
                            model.inner_sigma],
                           model.train_step_prior)
                for k, v in zip(INNER_KEYS, vals):
                    traj[k].append(v)

                # sub-step 4: inner sigma (base.py:631-636)
                lr_inner = (config["learning_rate_inner_sigma"]
                            * 1.01 ** (cur_epoch - 1))
                sub(3, {model.lr_inner_sigma: lr_inner}, [],
                    model.train_step_inner_sigma)
            else:
                # vampPrior: the prior sub-step optimises loss_prior
                # (= negative_elbo, base.py:408-412) over the pseudo-input
                # variable only; no inner-sigma sub-step (base.py:509-511)
                vals = sub(2, {model.lr_prior: lr_prior},
                           [model.crossEntropy_prior, model.loss_prior],
                           model.train_step_prior)
                traj["crossEntropy_prior_substep"].append(vals[0])
                traj["loss_prior"].append(vals[1])

        out = {k: np.asarray(v) for k, v in traj.items()}
        if cycle:
            out["fit_w"] = fitted["w"]
            out["fit_m"] = fitted["m"]
            out["fit_K"] = fitted["K"]
            out["fit_samples"] = fit_samples
        for v in tf1.trainable_variables():
            out[f"var::{v.op.name}"] = sess.run(v)
    np.savez(args.out, **out)
    print("REFEXEC_TRAIN_OK")


if __name__ == "__main__":
    main()
