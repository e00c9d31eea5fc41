"""Execute the REFERENCE TF1 graph (read-only, from /root/reference) under
tf.compat.v1 with a minimal tf.contrib / tensorflow_probability shim,
restore a checkpoint produced by OUR exporter through the reference's own
tf.train.Saver load path, and dump deterministic head outputs for
side-by-side comparison.

Run as a subprocess of tests/test_reference_execution.py — v1-mode global
state (disable_v2_behavior) must not leak into the pytest process.

What executes as genuine reference code: every tf.layers conv/dense, the
symmetric pad, depth_to_space pyramid, tf.cond input switches, the
closed-form entropy/cross-entropy expressions, the sigma floor and the
two Savers (base.py / models.py, verbatim from /root/reference). The shim
substitutes ONLY: xavier_initializer (irrelevant — weights are restored
over it) and the tfp distributions (sampling helpers; their math is
cross-parity-tested separately in tests/test_tf_parity.py /
test_distributions.py). Every tensor fetched here is deterministic given
the feeds — no shim sampling affects any compared value.

Usage: python refexec_driver.py --config cfg.json --batch batch.npz --out out.npz
  cfg.json must carry checkpoint_dir holding vae-model.* / prior-model.*
  (our exporter's output) — .meta stubs are created so the reference's
  load() gate (base.py:72-85) passes.
"""

import argparse
import json
import os
import sys
import types

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

import numpy as np


def install_shims():
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()

    # ---- tf.contrib: only xavier_initializer is touched on the MNIST path
    contrib = types.ModuleType("tensorflow.contrib")
    contrib_layers = types.ModuleType("tensorflow.contrib.layers")
    contrib_layers.xavier_initializer = (
        lambda *a, **k: tf1.glorot_uniform_initializer())
    contrib.layers = contrib_layers
    tf1.contrib = contrib

    # ---- tf.layers: unavailable under Keras 3 (the compat.v1 lazy loader
    # raises), so re-provide dense/conv2d/flatten with raw v1 ops.
    # tf1.variable_scope(None, default_name=...) reproduces TF1 layers'
    # exact variable naming and per-scope uniquification (dense, dense_1,
    # ... / explicit names verbatim), so the reference Savers see the
    # reference's variable set.
    #
    # Default names come from explicit per-scope counters rather than
    # tf1.variable_scope(None, default_name=...): under a reuse=True scope
    # (the vampPrior pseudo-input encoder, base.py:228-238) default_name
    # uniquification would mint FRESH scope names (conv2d_3, ...) and
    # reuse lookup would fail; a counter keyed by (scope, reuse) restarts
    # the sequence on the reuse visit so get_variable finds the originals.
    # On non-reuse paths the generated names are identical to TF1's.
    _layer_uids = {}

    def _layer_name(name, base):
        if name is not None:
            return name
        scope = tf1.get_variable_scope()
        key = (scope.name, bool(scope.reuse), base)
        k = _layer_uids.get(key, 0)
        _layer_uids[key] = k + 1
        return base if k == 0 else f"{base}_{k}"

    def _dense(inputs, units, activation=None, kernel_initializer=None,
               name=None):
        with tf1.variable_scope(_layer_name(name, "dense")):
            kernel = tf1.get_variable(
                "kernel", [int(inputs.shape[-1]), int(units)],
                dtype=tf1.float32, initializer=kernel_initializer)
            bias = tf1.get_variable(
                "bias", [int(units)], dtype=tf1.float32,
                initializer=tf1.zeros_initializer())
            out = tf1.matmul(inputs, kernel) + bias
            return activation(out) if activation is not None else out

    def _conv2d(inputs, filters, kernel_size, strides=1, padding="valid",
                activation=None, kernel_initializer=None, name=None):
        k = ([kernel_size] * 2 if isinstance(kernel_size, int)
             else list(kernel_size))
        s = [strides] * 2 if isinstance(strides, int) else list(strides)
        with tf1.variable_scope(_layer_name(name, "conv2d")):
            kernel = tf1.get_variable(
                "kernel", k + [int(inputs.shape[-1]), int(filters)],
                dtype=tf1.float32, initializer=kernel_initializer)
            bias = tf1.get_variable(
                "bias", [int(filters)], dtype=tf1.float32,
                initializer=tf1.zeros_initializer())
            out = tf1.nn.conv2d(inputs, kernel,
                                strides=[1, s[0], s[1], 1],
                                padding=padding.upper()) + bias
            return activation(out) if activation is not None else out

    def _flatten(inputs):
        d = int(np.prod([int(v) for v in inputs.shape[1:]]))
        return tf1.reshape(inputs, [-1, d])

    def _batch_normalization(inputs, training=None, epsilon=1e-3,
                             name=None):
        # the reference only ever runs training-mode BN (is_training is a
        # constant-True tensor, models.py:471), so batch statistics are
        # used unconditionally; gamma/beta live under the TF1 layer names.
        with tf1.variable_scope(_layer_name(name, "batch_normalization")):
            c = int(inputs.shape[-1])
            gamma = tf1.get_variable("gamma", [c], dtype=tf1.float32,
                                     initializer=tf1.ones_initializer())
            beta = tf1.get_variable("beta", [c], dtype=tf1.float32,
                                    initializer=tf1.zeros_initializer())
            mean, var = tf1.nn.moments(inputs, axes=[0, 1, 2])
            return tf1.nn.batch_normalization(inputs, mean, var, beta,
                                              gamma, epsilon)

    def _instance_norm(inputs, scale=False, center=False, trainable=False,
                       epsilon=1e-6):
        assert not (scale or center), "reference uses scale=center=False"
        mean, var = tf1.nn.moments(inputs, axes=[1, 2], keep_dims=True)
        return (inputs - mean) * tf1.rsqrt(var + epsilon)

    contrib_layers.instance_norm = _instance_norm

    layers_mod = types.ModuleType("tensorflow.layers")
    layers_mod.dense = _dense
    layers_mod.conv2d = _conv2d
    layers_mod.flatten = _flatten
    layers_mod.batch_normalization = _batch_normalization
    tf1.layers = layers_mod

    # ---- minimal tensorflow_probability.distributions
    class MultivariateNormalDiag:
        def __init__(self, loc, scale_diag):
            self.loc, self.scale = loc, scale_diag

        def sample(self, n=None):
            shape = tf1.shape(self.loc) if n is None else tf1.concat(
                [[n], tf1.shape(self.loc)], axis=0)
            eps = tf1.random.normal(shape)
            return self.loc + self.scale * eps

        def log_prob(self, x):
            z = (x - self.loc) / self.scale
            d = tf1.cast(tf1.shape(self.loc)[-1], tf1.float32)
            return (-0.5 * tf1.reduce_sum(tf1.square(z), axis=-1)
                    - tf1.reduce_sum(tf1.log(self.scale), axis=-1)
                    - 0.5 * d * tf1.log(tf1.constant(2.0 * np.pi)))

    class MultivariateNormalFullCovariance:
        def __init__(self, loc, covariance_matrix):
            self.loc = tf1.convert_to_tensor(loc)
            self.cov = tf1.convert_to_tensor(covariance_matrix)

        def log_prob(self, x):
            chol = tf1.linalg.cholesky(self.cov)
            diff = x - self.loc                              # [..., D]
            flat = tf1.reshape(diff, [-1, tf1.shape(diff)[-1]])
            sol = tf1.linalg.triangular_solve(
                chol, tf1.transpose(flat), lower=True)       # [D, N]
            quad = tf1.reduce_sum(tf1.square(sol), axis=0)   # [N]
            quad = tf1.reshape(quad, tf1.shape(diff)[:-1])
            d = tf1.cast(tf1.shape(self.loc)[-1], tf1.float32)
            logdet = tf1.reduce_sum(tf1.log(tf1.linalg.diag_part(chol)))
            return (-0.5 * quad - logdet
                    - 0.5 * d * tf1.log(tf1.constant(2.0 * np.pi)))

    class Categorical:
        def __init__(self, probs):
            self.probs = probs

    class Mixture:
        def __init__(self, cat, components):
            self.cat, self.components = cat, components

        def log_prob(self, x):
            comp = tf1.stack([c.log_prob(x) for c in self.components],
                             axis=0)                         # [K, ...]
            logw = tf1.log(self.cat.probs)                   # [K]
            extra = tf1.rank(comp) - 1
            logw = tf1.reshape(
                logw, tf1.concat([[tf1.shape(logw)[0]],
                                  tf1.ones([extra], tf1.int32)], axis=0))
            return tf1.reduce_logsumexp(comp + logw, axis=0)

        def sample(self, n=None):
            raise NotImplementedError("not needed for graph build")

    tfp_mod = types.ModuleType("tensorflow_probability")
    dist_mod = types.ModuleType("tensorflow_probability.distributions")
    for cls in (MultivariateNormalDiag, MultivariateNormalFullCovariance,
                Categorical, Mixture):
        setattr(dist_mod, cls.__name__, cls)
    tfp_mod.distributions = dist_mod
    sys.modules["tensorflow_probability"] = tfp_mod
    sys.modules["tensorflow"] = tf1
    return tf1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--batch", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    tf1 = install_shims()
    sys.path.insert(0, "/root/reference")
    import codes.models as ref_models  # noqa: E402  (reference code)

    with open(args.config) as f:
        config = json.load(f)
    model_cls = {
        "mnist_digit": ref_models.MNISTModel_digit,
        "mnist_fashion": ref_models.MNISTModel_fashion,
        "celeba": ref_models.CelebAModel_densenet,
    }[config["exp_name"]]
    model = model_cls(config)

    data = np.load(args.batch)
    x, z, t = data["x"], data["z"], data["t"]

    ckdir = config["checkpoint_dir"]
    for stub in ("vae-model.meta", "prior-model.meta"):
        open(os.path.join(ckdir, stub), "a").close()

    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        model.load(sess, "VAE")
        model.load(sess, "prior")

        out = {}
        out["code_mean"], out["code_std_dev"], out["entropy_z"], \
            out["ce_prior_sg"] = sess.run(
                [model.code_mean, model.code_std_dev, model.entropy_z,
                 model.crossEntropy_prior_sg],
                feed_dict={model.original_signal: x})
        out["decoded"], out["sigma"], out["mean_pixel_error"] = sess.run(
            [model.decoded, model.sigma, model.mean_pixel_error],
            feed_dict={model.original_signal: x,
                       model.is_code_input: True,
                       model.code_input: z})
        # original_signal must ride every feed: tensors created OUTSIDE a
        # tf.cond's lambdas (code_sample etc.) are cond inputs and always
        # execute — the reference's compute_feeddict (base.py:862-942)
        # likewise always feeds the image batch.
        out["rep_mean"], out["rep_std"] = sess.run(
            [model.representation_mean, model.representation_std_dev],
            feed_dict={model.original_signal: x,
                       model.is_outer_VAE_input: False,
                       model.customised_inner_VAE_input: z})
        out["decoded_code"], out["entropy_t"], out["inner_sigma"], \
            out["rep_regularisor"] = sess.run(
                [model.decoded_code, model.entropy_t, model.inner_sigma,
                 model.representation_regularisor],
                feed_dict={model.original_signal: x,
                           model.is_outer_VAE_input: False,
                           model.customised_inner_VAE_input: z,
                           model.is_representation_input: True,
                           model.representation_input: t})

        # ---- BACKWARD-pass parity: gradients of the deterministic
        # scalars through the reference's own autodiff graph. None-grads
        # (variables the scalar provably doesn't depend on) are skipped;
        # the test checks the surviving set leaf-by-leaf.
        tvars = {v.op.name: v for v in tf1.trainable_variables()}

        def grads_of(scalar, prefix, feed, tag):
            names = sorted(n for n in tvars if n.startswith(prefix))
            gs = tf1.gradients(scalar, [tvars[n] for n in names])
            keep = [(n, g) for n, g in zip(names, gs) if g is not None]
            vals = sess.run([g for _, g in keep], feed_dict=feed)
            for (n, _), v in zip(keep, vals):
                out[f"grad::{tag}::{n}"] = v

        grads_of(model.entropy_z, "encoder/",
                 {model.original_signal: x}, "entropy_z")
        grads_of(model.mean_pixel_error, "decoder/",
                 {model.original_signal: x, model.is_code_input: True,
                  model.code_input: z}, "mean_pixel_error")
        grads_of(model.entropy_t, "prior/",
                 {model.original_signal: x,
                  model.is_outer_VAE_input: False,
                  model.customised_inner_VAE_input: z}, "entropy_t")
        np.savez(args.out, **out)
    print("REFEXEC_OK")


if __name__ == "__main__":
    main()
