"""Demo helpers: embedding extraction, prior construction, interpolation
plots. Functional re-expression of /root/reference/demo/demo_tools.py on the
jitted forward functions."""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ladder_tpu.interp import prior_logpdf_fn  # noqa: E402
from ladder_tpu.utils.plotting import draw_ellipse  # noqa: E402


def get_embeddings_from_val_set(idx, config, trainer, x=None, save_plot=False):
    """Encode a validation image to its embedding (t for 'ours'/hierarchical,
    z otherwise) and plot the x / dec(z) / dec(dec(t)) triptych
    (demo_tools.py:41-75)."""
    if x is None:
        if hasattr(trainer.data, "val_set"):
            x = trainer.data.val_set["image"]
        else:
            # CelebA ships TFRecord splits rather than in-memory arrays:
            # read a full batch_size window covering idx (the encoder's
            # batch-stat BN wants a realistically sized batch)
            n = max(int(config["batch_size"]), idx + 1)
            n = min(n, trainer.data.val.n)
            x = trainer.data.val.reader.read_batch(np.arange(n))
    params = trainer.state["params"]
    fwd = trainer.fwd
    x_j = jnp.asarray(x)
    if config["prior"] in ("ours", "hierarchical"):
        z = fwd["encode_sample"](params, x_j, trainer._next_rng())
        t_mean, _ = fwd["inner_encode"](params, z)
        x_decoded = np.clip(np.asarray(fwd["decode"](params, z)), 0, 1)
        z_from_t = fwd["inner_decode"](params, t_mean)
        x_from_t = np.clip(np.asarray(fwd["decode"](params, z_from_t)), 0, 1)
        embedding = np.asarray(t_mean)
        _plot_triptych(np.asarray(x_j)[idx], x_decoded[idx], config,
                       x_from_t[idx], save_plot, idx)
    else:
        mean, _ = fwd["encode"](params, x_j)
        # the reference's 'decoded' panel uses the reparameterised sample
        # (model.decoded <- code_sample), not the posterior mean
        z = fwd["encode_sample"](params, x_j, trainer._next_rng())
        x_decoded = np.clip(np.asarray(fwd["decode"](params, z)), 0, 1)
        embedding = np.asarray(mean)
        _plot_triptych(np.asarray(x_j)[idx], x_decoded[idx], config,
                       None, save_plot, idx)
    return np.squeeze(embedding[idx])


def _plot_triptych(x, x_decoded, config, x_from_t=None, save_plot=False,
                   idx=0):
    n = 3 if x_from_t is not None else 2
    fig, axs = plt.subplots(1, n, figsize=(2 * n, 2), edgecolor="k")
    axs = np.atleast_1d(axs).ravel()
    axs[0].imshow(np.squeeze(x))
    axs[0].set_title("original")
    axs[1].imshow(np.squeeze(x_decoded))
    axs[1].set_title("decoded from z")
    if x_from_t is not None:
        axs[2].imshow(np.squeeze(x_from_t))
        axs[2].set_title("decoded from t")
    for ax in axs:
        ax.grid(False)
        ax.set_xticks([])
        ax.set_yticks([])
    if save_plot:
        plt.savefig(os.path.join(config["result_dir"],
                                 f"original_image_{idx}.pdf"))
    plt.close()


def define_prior_distribution(config, trainer, gmm_info=None):
    """log-prob closure for the configured prior (demo_tools.py:79-115)."""
    if config["prior"] == "vampPrior":
        params = trainer.state["params"]
        pseudo = trainer.model.pseudo_inputs(params)
        mean, std = trainer.fwd["encode"](params, pseudo)
        return prior_logpdf_fn(config, vamp_params=(mean, std))
    gm = None
    if config["prior"] in ("ours", "GMM"):
        if gmm_info is not None:
            gm = (gmm_info["w"], gmm_info["m"], gmm_info["K"])
        else:
            gm = trainer.gm_final or trainer.gm_fast
    return prior_logpdf_fn(config, gm=gm)


def plot_interpolation_losses(hist, n_iter, idx_start, idx_end, n_step,
                              config):
    """Four-panel loss curves with SP baselines (demo_tools.py:123-159)."""
    fig, axs = plt.subplots(1, 4, figsize=(15, 2.5), edgecolor="k")
    fig.subplots_adjust(hspace=0.2, wspace=0.4)
    axs = axs.ravel()
    panels = [(np.asarray(hist["obj"]), "Overall loss", False),
              (np.asarray(hist["path_length"]), "Path length", True),
              (np.asarray(hist["step_var"]), "Step variance", True),
              (np.asarray(hist["neg_ll"]), "Negative LL", True)]
    for ax, (series, title, baseline) in zip(axs, panels):
        ax.plot(series, lw=2, label="SLP")
        if baseline:
            ax.axhline(y=series[0], color="r", ls="--", lw=2, label="SP")
            ax.legend()
        ax.set_title(title)
        ax.grid(True)
        ax.set_xlabel("Iteration")
        ax.set_xlim(0, n_iter)
    dim = (config["representation_size"]
           if config["prior"] in ("ours", "hierarchical")
           else config["code_size"])
    plt.savefig(os.path.join(
        config["result_dir"],
        "loss_image{}-{}_{}_zdim_{}_nstep_{}.pdf".format(
            idx_start, idx_end, config["prior"], dim, n_step)))
    plt.close()


def plot_interpolated_images(interpolated_embeddings, config, trainer,
                             n_step, idx_start, idx_end, save_plot=True,
                             name_input=""):
    """Decode the path t->z->x (or z->x) and plot the image strip
    (demo_tools.py:163-212)."""
    params = trainer.state["params"]
    emb = jnp.asarray(interpolated_embeddings, dtype=jnp.float32)
    if config["prior"] in ("ours", "hierarchical"):
        z = trainer.fwd["inner_decode"](params, emb)
    else:
        z = emb
    images = np.clip(np.asarray(trainer.fwd["decode"](params, z)), 0, 1)

    fig, axs = plt.subplots(1, n_step + 2, figsize=(2 * n_step, 2),
                            edgecolor="k")
    fig.subplots_adjust(hspace=0.0, wspace=0.0)
    axs = axs.ravel()
    axs[0].set_title("Start")
    axs[n_step + 1].set_title("Target")
    for i in range(n_step + 2):
        axs[i].imshow(np.squeeze(images[i]))
        axs[i].grid(False)
        axs[i].set_xticks([])
        axs[i].set_yticks([])
        if 1 <= i <= n_step:
            axs[i].set_title(f"Step {i}")
    if save_plot:
        dim = (config["representation_size"]
               if config["prior"] in ("ours", "hierarchical")
               else config["code_size"])
        plt.savefig(os.path.join(
            config["result_dir"],
            "interpolated_image{}-{}_{}_zdim_{}_nstep_{}_{}.pdf".format(
                idx_start, idx_end, config["prior"], dim, n_step,
                name_input)))
    plt.close()
    return images


def plot_optimised_path(cur_pts, config, gm, trainer, embedding_start,
                        embedding_end, idx_start, idx_end, n_step,
                        log_prob=None, plot_prior="density", w=2.0,
                        save_plot=True, grid_size=8.0, name_input="", c="b"):
    """2-D path overlay on the prior (demo_tools.py:216-288). `trainer` is
    unused here (the reference needed sess/model for branches this port
    computes via log_prob); kept for the reference/notebook call shape."""
    fig, axs = plt.subplots(1, 1, figsize=(10, 10), edgecolor="k")
    if plot_prior == "circle" and gm is not None:
        w_, m_, K_ = [np.asarray(a) for a in gm]
        for i in range(len(w_)):
            draw_ellipse(m_[i], K_[i], w_[i] * w, ax=axs, color="k")
    elif plot_prior == "density" and log_prob is not None:
        xs, ys = np.mgrid[-grid_size:grid_size:.05, -grid_size:grid_size:.05]
        pos = np.dstack([xs, ys]).astype(np.float32)
        logp = np.asarray(log_prob(jnp.asarray(pos.reshape(-1, 2))))
        prior_pdf = np.exp(logp).reshape(xs.shape) + 1e-8
        im = axs.imshow(np.log(prior_pdf), cmap="viridis", vmin=-14, vmax=0)
        # axes in latent coordinates, not pixel indices (the reference's
        # tick remap, demo_tools.py:250-265)
        ticks = np.arange(0, grid_size // 0.05 * 2, 4 // 0.05 + 1)
        labels = list(np.arange(-grid_size, grid_size, 4))
        axs.set_xticks(ticks)
        axs.set_xticklabels(labels)
        axs.set_yticks(ticks)
        axs.set_yticklabels(labels)
        fig.colorbar(im)

    pts_start = np.concatenate([embedding_start[None], np.asarray(cur_pts)],
                               axis=0)
    pts_end = np.concatenate([np.asarray(cur_pts), embedding_end[None]],
                             axis=0)
    if plot_prior == "density":
        pts_start = (pts_start + grid_size) // 0.05
        pts_end = (pts_end + grid_size) // 0.05
    for i in range(n_step + 1):
        axs.plot([pts_start[i, 1], pts_end[i, 1]],
                 [pts_start[i, 0], pts_end[i, 0]], "-", color=c, lw=4,
                 zorder=1)
    axs.plot(pts_start[1:, 1], pts_start[1:, 0], ".", color=c, ms=15,
             zorder=50, label="Interpolation")
    axs.scatter(pts_start[0, 1], pts_start[0, 0], c="beige", s=80,
                label="Start", zorder=120)
    axs.scatter(pts_end[-1, 1], pts_end[-1, 0], c="orangered", s=80,
                label="Target", zorder=120)
    axs.legend()
    plt.title(f"interpolation method: {name_input}")
    if save_plot:
        dim = (config["representation_size"]
               if config["prior"] in ("ours", "hierarchical")
               else config["code_size"])
        plt.savefig(os.path.join(
            config["result_dir"],
            "interpolated_path{}-{}_{}_zdim_{}_nstep_{}_{}.pdf".format(
                idx_start, idx_end, config["prior"], dim, n_step,
                name_input)))
    plt.close()
