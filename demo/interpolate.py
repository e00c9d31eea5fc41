"""Latent-space SLP interpolation demo (script form of the reference's
latent-space-interpolation-mnist.ipynb).

Usage:
    python demo/interpolate.py --config demo/mnist_digit_config.json \
        [--idx-start 0] [--idx-end 32] [--n-step 8] [--n-iter 500]

Loads the trained model from the config's checkpoint layout, fits the
accurate DP-GMM over 20k t-encodings (notebook cell 14), optimises the
shortest-likelihood path between two validation embeddings (cells 18-21) and
writes the SLP vs SP image strips, loss curves and 2-D path/density overlays
(cells 23-25) into result_dir.
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="demo/mnist_digit_config.json")
    ap.add_argument("--idx-start", type=int, default=0)
    ap.add_argument("--idx-end", type=int, default=32)
    ap.add_argument("--n-step", type=int, default=8)
    ap.add_argument("--n-iter", type=int, default=500)
    ap.add_argument("--init", default="linear", choices=["linear", "random"])
    args = ap.parse_args()

    from ladder_tpu.utils.config import (
        enable_compilation_cache,
        honor_cpu_platform_request,
    )
    honor_cpu_platform_request()
    enable_compilation_cache()

    import jax.numpy as jnp

    from demo.demo_tools import (
        define_prior_distribution,
        get_embeddings_from_val_set,
        plot_interpolated_images,
        plot_interpolation_losses,
        plot_optimised_path,
    )
    from ladder_tpu.interp import interpolate
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.utils.config import create_dirs, process_config

    config = process_config(args.config)
    create_dirs([config["result_dir"]])
    config.setdefault("enable_plots", 0)

    # model/data/trainer dispatch on exp_name, mirroring train.py (and the
    # reference notebook's hand wiring of cells 10-12)
    if config["exp_name"] == "celeba":
        from ladder_tpu.data.celeba import CelebAData
        from ladder_tpu.training.celeba_trainer import CelebATrainer
        data = CelebAData(config)
        model = make_model(config)
        trainer = CelebATrainer(model, data, config)
    else:
        from ladder_tpu.data.mnist import DataGenerator
        from ladder_tpu.training.trainer import MNISTTrainer
        data = DataGenerator(config)
        model = make_model(config)
        trainer = MNISTTrainer(model, data, config)
    trainer.restore()

    # accurate GM fit over t-space (notebook cell 14)
    if config["prior"] in ("ours", "GMM"):
        space = "t" if config["prior"] == "ours" else "z"
        trainer.cur_epoch = max(trainer.cur_epoch, 1)
        trainer.fit_GMM_VI(mode="accurate", space=space)

    print("Start sample:")
    embedding_start = get_embeddings_from_val_set(
        args.idx_start, config, trainer, save_plot=True)
    print("Target sample:")
    embedding_end = get_embeddings_from_val_set(
        args.idx_end, config, trainer, save_plot=True)

    log_prob = define_prior_distribution(config, trainer)

    def prior_sample_fn(rng, n):
        """Random-init interior points drawn from the fitted prior (the
        reference notebook's 'random' branch samples the GM)."""
        if config["prior"] in ("ours", "GMM"):
            from ladder_tpu.ops.distributions import gmm_cholesky, sample_gmm
            w, m, K = trainer.gm_final or trainer.gm_fast
            return sample_gmm(rng, w, m, gmm_cholesky(K), n)
        dim = (config["representation_size"]
               if config["prior"] in ("ours", "hierarchical")
               else config["code_size"])
        import jax
        return jax.random.normal(rng, (n, dim))

    slp_pts, sp_pts, hist = interpolate(
        config, jnp.asarray(embedding_start, dtype=jnp.float32),
        jnp.asarray(embedding_end, dtype=jnp.float32), log_prob,
        n_step=args.n_step, n_iter=args.n_iter, init=args.init,
        rng=trainer._next_rng(), sample_fn=prior_sample_fn,
    )
    print("Final loss: {:.4f}; path length {:.4f} (SP {:.4f}); "
          "neg-LL {:.4f} (SP {:.4f})".format(
              float(hist["obj"][-1]), float(hist["path_length"][-1]),
              float(hist["path_length"][0]), float(hist["neg_ll"][-1]),
              float(hist["neg_ll"][0])))

    plot_interpolation_losses(hist, args.n_iter, args.idx_start, args.idx_end,
                              args.n_step, config)

    full_slp = np.concatenate([embedding_start[None], np.asarray(slp_pts),
                               embedding_end[None]], axis=0)
    full_sp = np.concatenate([embedding_start[None], np.asarray(sp_pts),
                              embedding_end[None]], axis=0)
    print("SLP interpolation (ours)")
    plot_interpolated_images(full_slp, config, trainer, args.n_step,
                             args.idx_start, args.idx_end, name_input="SLP")
    print("SP interpolation")
    plot_interpolated_images(full_sp, config, trainer, args.n_step,
                             args.idx_start, args.idx_end, name_input="SP")

    if (config["prior"] in ("ours", "hierarchical")
            and config["representation_size"] == 2):
        gm = trainer.gm_final or trainer.gm_fast
        for pts, name in [(slp_pts, "SLP"), (sp_pts, "SP")]:
            plot_optimised_path(
                pts, config, gm, trainer, embedding_start, embedding_end,
                args.idx_start, args.idx_end, args.n_step, log_prob=log_prob,
                plot_prior="density", grid_size=7, name_input=name)
    print("Demo artifacts written to {}".format(config["result_dir"]))


if __name__ == "__main__":
    main()
