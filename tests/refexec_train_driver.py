"""Execute the REFERENCE's own TRAIN OPS (read-only, from /root/reference)
side-by-side-ably: restore a checkpoint produced by OUR exporter, then run
the reference's per-batch training protocol — sess.run(train_step_ae), then
train_step_sigma, train_step_prior, train_step_inner_sigma, each a separate
graph execution exactly as BaseTrain.train_step_ae / train_step_prior drive
them (/root/reference/codes/base.py:583-641, trainers.py:33-40) — for S
steps, and dump the full loss/sigma trajectories plus the final weights.

What executes as genuine reference code: the whole forward graph (as in
refexec_driver.py), define_loss, compute_gradients — i.e. the reference's
OWN tf.train.AdamOptimizer(beta1=0.9, beta2=0.95) instances, its
ClipIfNotNone +-1 clipping, its 4-optimiser-group sequential update order
(base.py:457-517), and its lr schedules (base.py:589, 601, 610, 633-636).

The ONLY substitution beyond refexec_driver's shims: the shim tfp
MultivariateNormalDiag.sample() reads eps from a placeholder instead of
tf.random.normal, fed from the npz. The reference graph has exactly three
sample sites ('ours' prior: z at models.py:100, t at base.py:167, MC at
base.py:311); the JAX side consumes the identical eps stream, so every
divergence in the recorded trajectories is framework math, not noise.

Usage: python refexec_train_driver.py --config cfg.json --data data.npz \
           --out out.npz
data.npz:
  batches  [S, B, H, W, C]   one batch per step
  eps_z    [S, 4, B, code]   per step x sub-step (ae, sigma, prior, inner)
  eps_t    [S, 4, B, rep]
  eps_mc   [S, 4, L, B, rep]
  gm_means [K, rep], gm_cov [K, rep, rep], gm_weights [K]
  steps_sg []                steps 0..steps_sg-1 run at cur_epoch ==
                             sg_pretraining (sg-overlap epoch: sg feeds,
                             prior training active, trainers.py:39); the
                             rest at sg_pretraining+1 with the GM feeds.
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
    assert prior in ("ours", "vampPrior"), prior
    model = ref_models.MNISTModel_digit(config)
    if prior == "ours":
        # creation order: z (models.py:100), t (base.py:167), MC (base.py:311)
        assert len(eps_phs) == 3, f"expected 3 sample sites, saw {len(eps_phs)}"
        ph_z, ph_t, ph_mc = eps_phs
    else:
        # vampPrior: z (models.py:100) and the L-sample MC estimate
        # (base.py:364-366); define_vampPrior's per-component MVNDiags
        # never call sample()
        assert len(eps_phs) == 2, f"expected 2 sample sites, saw {len(eps_phs)}"
        ph_z, ph_mc = eps_phs
        ph_t = None

    data = np.load(args.data)
    batches = data["batches"]
    S = batches.shape[0]
    steps_sg = int(data["steps_sg"])
    n_mix, rep = data["gm_means"].shape
    sgp = config["sg_pretraining"]

    ckdir = config["checkpoint_dir"]
    for stub in ("vae-model.meta", "prior-model.meta"):
        open(os.path.join(ckdir, stub), "a").close()

    # trajectory buffers, keyed like the BaseTrain record lists
    if prior == "ours":
        traj_keys = (
            "loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
            "crossEntropy_prior", "sigma_regularisor", "sigma", "elbo_prior",
            "code_l1_reconstruction_error", "code_reconstruction_likelihood",
            "entropy_t", "crossEntropy_representation", "inner_sigma")
    else:  # vampPrior: base.py:625-634 'else' branch record lists
        traj_keys = (
            "loss_ae", "elbo", "l1_reconstruction_error", "entropy_z",
            "crossEntropy_prior", "sigma_regularisor", "sigma",
            "loss_prior", "crossEntropy_prior_substep")
    traj = {k: [] for k in traj_keys}

    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        model.load(sess, "VAE")
        model.load(sess, "prior")

        for s in range(S):
            in_sg = s < steps_sg
            cur_epoch = sgp if in_sg else sgp + 1
            if prior == "ours":
                # compute_feeddict for 'ours' (base.py:868-900)
                feed = {
                    model.original_signal: batches[s],
                    model.is_code_input: False,
                    model.code_input: np.zeros((1, config["code_size"]),
                                               np.float32),
                    model.is_outer_VAE_input: True,
                    model.customised_inner_VAE_input: np.zeros(
                        (1, config["code_size"]), np.float32),
                    model.is_representation_input: False,
                    model.representation_input: np.zeros((1, rep),
                                                         np.float32),
                    model.use_mask: cur_epoch >= config["use_mask_start"],
                }
                if in_sg:
                    feed[model.prior_mean] = np.zeros((n_mix, rep),
                                                      np.float32)
                    feed[model.prior_cov] = np.tile(
                        np.eye(rep, dtype=np.float32), (n_mix, 1, 1))
                    feed[model.prior_weight] = np.full((n_mix,), 1.0 / n_mix,
                                                       np.float32)
                    feed[model.use_standard_gaussian_prior] = True
                else:
                    feed[model.prior_mean] = data["gm_means"]
                    feed[model.prior_cov] = data["gm_cov"]
                    feed[model.prior_weight] = data["gm_weights"]
                    feed[model.use_standard_gaussian_prior] = False
            else:
                # compute_feeddict for 'vampPrior' (base.py:934-942)
                feed = {
                    model.original_signal: batches[s],
                    model.is_code_input: False,
                    model.code_input: np.zeros((1, config["code_size"]),
                                               np.float32),
                    model.use_standard_gaussian_prior: in_sg,
                }

            def sub(i, extra, fetches, op, feed=feed, s=s):
                f = dict(feed)
                f[ph_z] = data["eps_z"][s, i]
                if ph_t is not None:
                    f[ph_t] = data["eps_t"][s, i]
                f[ph_mc] = data["eps_mc"][s, i]
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

            # sub-step 3: prior (train_step_prior, base.py:608-629);
            # trainers.py:39 gates on cur_epoch > sg_pretraining-1, true
            # for both phases here
            lr_prior = (config["learning_rate_prior"]
                        * 1.01 ** (cur_epoch - 1))
            if prior == "ours":
                vals = sub(2, {model.lr_prior: lr_prior},
                           [model.elbo_prior,
                            model.code_l1_reconstruction_error,
                            model.code_reconstruction_likelihood,
                            model.entropy_t,
                            model.crossEntropy_representation,
                            model.inner_sigma],
                           model.train_step_prior)
                for k, v in zip(("elbo_prior",
                                 "code_l1_reconstruction_error",
                                 "code_reconstruction_likelihood",
                                 "entropy_t", "crossEntropy_representation",
                                 "inner_sigma"), vals):
                    traj[k].append(v)

                # sub-step 4: inner sigma (base.py:631-636)
                lr_inner = (config["learning_rate_inner_sigma"]
                            * 1.01 ** (cur_epoch - 1))
                sub(3, {model.lr_inner_sigma: lr_inner}, [],
                    model.train_step_inner_sigma)
            else:
                # vampPrior: the prior sub-step optimises loss_prior
                # (= negative_elbo, base.py:408-409) over the pseudo-input
                # variable only; no inner-sigma sub-step (base.py:509-511)
                vals = sub(2, {model.lr_prior: lr_prior},
                           [model.crossEntropy_prior, model.loss_prior],
                           model.train_step_prior)
                traj["crossEntropy_prior_substep"].append(vals[0])
                traj["loss_prior"].append(vals[1])

        out = {k: np.asarray(v) for k, v in traj.items()}
        for v in tf1.trainable_variables():
            out[f"var::{v.op.name}"] = sess.run(v)
    np.savez(args.out, **out)
    print("REFEXEC_TRAIN_OK")


if __name__ == "__main__":
    main()
