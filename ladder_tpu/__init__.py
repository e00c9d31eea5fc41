"""ladder_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for LaDDer-style
latent data-distribution modelling.

Re-designed from scratch for TPU hardware with the same capabilities as the
LaDDer reference (lin-shuyu/ladder-latent-data-distribution-modelling, BMVC'20):

  * outer conv VAE (MNIST digit / MNIST fashion / CelebA-128 style decoder)
  * inner MLP VAE over the latent code z  ->  2-D representation t
  * non-parametric Bayesian Gaussian-mixture hyper-prior over t, fit on device
  * five selectable prior modes: standard_gaussian, GMM, ours, hierarchical,
    vampPrior
  * shortest-likelihood-path (SLP) latent interpolation
  * single fused jitted train step with per-group Adam optimisers
  * SPMD data parallelism over a `jax.sharding.Mesh` (ICI all-reduce via XLA)

Public API parity: the same JSON config schema, the same `train.py --config`
CLI, the same output artifacts ({exp}-result.npz, GM_prior_info.npz, PDF
plots) and directory scheme as the reference.
"""

__version__ = "0.1.0"
