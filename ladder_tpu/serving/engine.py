"""Fixed-shape jitted inference engine for trained LaDDer models.

Serving differs from the training path in three ways this class owns:

1. **Static shapes.** Every entry point pads client batches up to a fixed
   `serve_batch` so XLA compiles each path exactly once (ragged client
   batches never recompile); the pad rows are stripped before returning.
2. **Warm start.** `warmup()` drives every path once at the serve shape so
   the first real request never pays compilation.
3. **Scale-out.** `mesh_devices=N` shards the batch axis of every path over
   a 1-D data-parallel `jax.sharding.Mesh` with replicated parameters —
   the same GSPMD layout as training (parallel/mesh.py), so a v5p-8 slice
   serves 8x the batch with no code change.

Checkpoint compatibility: loads the reference-layout two-group msgpack
files written by utils/checkpoint.py (the re-expression of the reference's
two tf.train.Savers, /root/reference/codes/base.py:37-85) and the
GM_prior_info.npz accurate hyper-prior fit (base.py:768-777). Generation
reproduces the trainer's sampling semantics
(training/trainer.py:sample_codes_from_prior; reference base.py:1065-1168).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ladder_tpu.models.builder import (
    PRIORS_WITH_GM,
    PRIORS_WITH_INNER_VAE,
    PRIORS_WITH_PRIOR_MODEL,
    make_model,
)
from ladder_tpu.ops.distributions import (
    gmm_cholesky,
    gmm_logpdf,
    sample_diag_gaussian,
    sample_gmm,
)
from ladder_tpu.utils.checkpoint import CheckpointManager


def _pad_to(x, n):
    """Pad axis 0 up to n rows (repeat-last keeps shapes conv-safe)."""
    k = x.shape[0]
    if k == n:
        return x
    if k == 0:
        raise ValueError("empty batch (0 rows)")
    if k > n:
        raise ValueError(f"batch {k} exceeds bucket {n}")
    pad = jnp.broadcast_to(x[-1:], (n - k,) + x.shape[1:])
    return jnp.concatenate([x, pad], axis=0)


class InferenceEngine:
    """One trained model, compiled for serving.

    Parameters
    ----------
    config : the training config dict (utils/config.py schema). Shapes,
        prior mode and directory layout all come from here.
    checkpoint_dir : override for config['checkpoint_dir'].
    gm_info_path : override for result_dir/GM_prior_info.npz ('ours'/'GMM').
    serve_batch : largest compile batch for the image/code paths.
    buckets : extra (smaller) compile batch sizes. A request dispatches to
        the smallest bucket that fits, so a 1-image request pays ~bucket-1
        latency instead of serve_batch compute; requests larger than
        serve_batch are chunked. Buckets incompatible with the mesh
        (not divisible by mesh_devices) are dropped.

        BatchNorm caveat: the CelebA encoder normalises with BATCH
        statistics by construction (the reference graph is always in
        training mode and keeps no moving averages — models.py:471, a
        preserved parity quirk), so its outputs depend on everything in
        the compiled batch, including the repeat-padding rows. That was
        equally true of the pre-bucket engine (pad counts varied with
        request size); bucketing only changes WHICH padded composition a
        given request size sees. Dispatch is deterministic (same request
        -> same bucket -> same result); MNIST-family models are BN-free
        and bucket-invariant, which tests/test_serving.py pins.
        bn_stats_path opts out entirely: with estimated population
        statistics (scripts/freeze_bn.py -> serving/bn_freeze.py) the
        encoder BN is frozen and every path becomes per-row-deterministic
        and bucket-invariant for CelebA too.
    dtype : 'float32' (default) or 'bfloat16' for the conv stacks.
    mesh_devices : 0 = single device; N>0 = shard batch over N devices.
    """

    def __init__(self, config, checkpoint_dir=None, gm_info_path=None,
                 serve_batch=64, buckets=(1, 8), dtype=None, mesh_devices=0,
                 allow_uninitialized=False, bn_stats_path=None):
        cfg = dict(config)
        if dtype is not None:
            cfg["dtype"] = dtype
        if checkpoint_dir is not None:
            cfg["checkpoint_dir"] = checkpoint_dir
        if bn_stats_path is not None:
            # per-row-deterministic BN: normalise with the estimated
            # population statistics instead of batch statistics (see
            # serving/bn_freeze.py and the BatchNorm caveat below)
            cfg["bn_mode"] = "frozen"
        self.config = cfg
        self.serve_batch = int(serve_batch)
        if mesh_devices:
            # fail at construction with a clear message, not at the first
            # jitted call as an obscure GSPMD sharding error
            if mesh_devices > len(jax.devices()):
                raise ValueError(
                    f"mesh_devices={mesh_devices} but only "
                    f"{len(jax.devices())} devices are available")
            if self.serve_batch % mesh_devices:
                raise ValueError(
                    f"serve_batch={serve_batch} must be divisible by "
                    f"mesh_devices={mesh_devices}")
        self.buckets = sorted(
            {int(b) for b in buckets
             if 0 < int(b) < self.serve_batch
             and (not mesh_devices or int(b) % mesh_devices == 0)}
            | {self.serve_batch})
        self.model = make_model(cfg)
        self.prior = cfg["prior"]
        if bn_stats_path is not None:
            from ladder_tpu.serving.bn_freeze import load_bn_stats
            if cfg.get("exp_name") != "celeba":
                raise ValueError(
                    "bn_stats_path applies to CelebA models only "
                    f"(exp_name={cfg.get('exp_name')!r} has no BatchNorm)")
            self.model.set_bn_stats(load_bn_stats(bn_stats_path))

        params = self.model.init(jax.random.PRNGKey(0))
        state = {"params": params}
        ck = CheckpointManager(cfg)
        # Training-side load soft-fails (reference restore parity,
        # base.py:68-85); a SERVING engine must not silently answer with
        # random weights, so missing checkpoints are an error unless the
        # caller opts out (benchmarks, smoke tests).
        if not allow_uninitialized:
            missing = [p for p in [ck.path_vae]
                       + ([ck.path_prior]
                          if self.prior in PRIORS_WITH_PRIOR_MODEL else [])
                       if not os.path.isfile(p)]
            if missing:
                raise FileNotFoundError(
                    "serving requires trained checkpoints; missing: "
                    f"{missing} (pass allow_uninitialized=True to serve "
                    "random-init weights anyway)")
        state = ck.load(state, "VAE")
        if self.prior in PRIORS_WITH_PRIOR_MODEL:
            state = ck.load(state, "prior")
        self.params = state["params"]

        self.gm = self._load_gm(gm_info_path)
        self.mesh = None
        if mesh_devices:
            from ladder_tpu.parallel.mesh import make_mesh, replicate
            self.mesh = make_mesh(devices=jax.devices()[:mesh_devices])
            self.params = replicate(self.params, self.mesh)

        self._build()
        self._latency = {}

    # -- artifact loading ----------------------------------------------
    def _load_gm(self, gm_info_path):
        if self.prior not in PRIORS_WITH_GM:
            return None
        # search order: explicit path -> the run's result_dir (where the
        # trainer writes accurate fits, base.py:769-777) -> next to the
        # checkpoint (how pretrained_models/ ships the fit, mirroring the
        # reference's figures/<exp>/result/GM_prior_info.npz demo artifact)
        candidates = [gm_info_path] if gm_info_path else [
            os.path.join(self.config["result_dir"], "GM_prior_info.npz"),
            os.path.join(self.config["checkpoint_dir"], "GM_prior_info.npz"),
        ]
        path = next((p for p in candidates if p and os.path.isfile(p)), None)
        if path is None:
            return None
        info = np.load(path)
        w = jnp.asarray(info["w_full"], jnp.float32)
        m = jnp.asarray(info["m_full"], jnp.float32)
        K = jnp.asarray(info["K_full"], jnp.float32)
        # jitter-free cholesky matches the trainer's sampling exactly
        # (trainer.py sample_codes_from_prior); the fit itself already
        # regularised the covariances.
        return dict(weights=w, means=m, chols=gmm_cholesky(K))

    # -- compiled paths --------------------------------------------------
    def _jit(self, fn):
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P
        data = NamedSharding(self.mesh, P("data"))
        return jax.jit(fn, in_shardings=(None, data),
                       out_shardings=data)

    def _build(self):
        model, cfg = self.model, self.config

        def _norm(x):
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) * (1.0 / 255.0)
            return x

        def encode(params, x):
            mean, std = model.encode(params, _norm(x))
            return mean, std

        def decode(params, z):
            return jnp.clip(model.decode(params, z), 0.0, 1.0)

        def reconstruct(params, x):
            mean, _ = model.encode(params, _norm(x))
            return jnp.clip(model.decode(params, mean), 0.0, 1.0)

        self._encode = self._jit(encode)
        self._decode = self._jit(decode)
        self._reconstruct = self._jit(reconstruct)

        if self.prior in PRIORS_WITH_INNER_VAE:
            def represent(params, x):
                mean, _ = model.encode(params, _norm(x))
                t_mean, t_std = model.inner_encode(params, mean)
                return t_mean, t_std

            def decode_representation(params, t):
                """t-space point -> image: inner decoder's mean code, then
                the outer decoder (the demo's SLP-interpolation render
                path, demo_tools.py)."""
                z = model.inner_decode(params, t)[0]
                return jnp.clip(model.decode(params, z), 0.0, 1.0)

            self._represent = self._jit(represent)
            self._decode_representation = self._jit(decode_representation)

        # generation: rng-driven, params replicated; one fused program
        def gen_codes(params, rng, gm):
            n = self.serve_batch
            if self.prior == "standard_gaussian":
                return jax.random.normal(rng, (n, cfg["code_size"]))
            if self.prior == "GMM":
                return sample_gmm(rng, gm["weights"], gm["means"],
                                  gm["chols"], n)
            if self.prior == "ours":
                t = sample_gmm(rng, gm["weights"], gm["means"],
                               gm["chols"], n)
                return model.inner_decode(params, t)[0]
            if self.prior == "hierarchical":
                t = jax.random.normal(rng, (n, cfg["representation_size"]))
                return model.inner_decode(params, t)[0]
            if self.prior == "vampPrior":
                pseudo = model.pseudo_inputs(params)
                mean, std = model.encode(params, pseudo)
                rng_k, rng_eps = jax.random.split(rng)
                k = jax.random.randint(rng_k, (n,), 0, cfg["n_mixtures"])
                return sample_diag_gaussian(rng_eps, mean[k], std[k])
            raise ValueError(self.prior)

        def generate(params, rng, gm):
            return jnp.clip(model.decode(params, gen_codes(params, rng, gm)),
                            0.0, 1.0)

        # generate/t_logpdf take no batch-sharded INPUT; under a mesh the
        # output sharding partitions the computation over the devices
        if self.mesh is None:
            self._generate = jax.jit(generate)
            self._t_logpdf = jax.jit(
                lambda t, gm: gmm_logpdf(t, gm["weights"], gm["means"],
                                         gm["chols"]))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P("data"))
            self._generate = jax.jit(generate, out_shardings=data)
            self._t_logpdf = jax.jit(
                lambda t, gm: gmm_logpdf(t, gm["weights"], gm["means"],
                                         gm["chols"]),
                in_shardings=(data, None), out_shardings=data)

    # -- public API -------------------------------------------------------
    def _bucket_for(self, n):
        """Smallest compiled bucket that fits n rows."""
        for b in self.buckets:
            if n <= b:
                return b
        return self.serve_batch

    def _run(self, name, fn, x, *rest):
        n = x.shape[0]
        if n == 0:
            raise ValueError(f"{name}: empty batch (0 rows)")
        if n > self.serve_batch:
            # chunk oversized batches instead of erroring (batch jobs and
            # HTTP clients routinely exceed one serve batch)
            parts = [self._run(name, fn, x[i:i + self.serve_batch], *rest)
                     for i in range(0, n, self.serve_batch)]
            return jax.tree.map(
                lambda *leaves: np.concatenate(leaves, axis=0), *parts)
        b = self._bucket_for(n)
        t0 = time.perf_counter()
        out = fn(self.params, _pad_to(jnp.asarray(x), b), *rest)
        out = jax.tree.map(lambda a: np.asarray(a)[:n], out)
        dt = time.perf_counter() - t0
        for key in (name, f"{name}@b{b}"):
            ema = self._latency.get(key)
            self._latency[key] = dt if ema is None else 0.9 * ema + 0.1 * dt
        return out

    def encode(self, x):
        """images [N,H,W,C] (uint8 or [0,1] float) -> (code_mean, code_std)."""
        return self._run("encode", self._encode, x)

    def decode(self, z):
        """codes [N, code_size] -> images [N,H,W,C] clipped to [0,1]."""
        return self._run("decode", self._decode, z)

    def reconstruct(self, x):
        """images -> posterior-mean reconstructions in [0,1]."""
        return self._run("reconstruct", self._reconstruct, x)

    def represent(self, x):
        """images -> 2-D representation (t_mean, t_std) ('ours'/'hierarchical')."""
        if self.prior not in PRIORS_WITH_INNER_VAE:
            raise ValueError(f"prior {self.prior} has no t-space")
        return self._run("represent", self._represent, x)

    def decode_representation(self, t):
        """t-space points [N, representation_size] -> images in [0,1]
        ('ours'/'hierarchical'): the SLP-interpolation render path."""
        if self.prior not in PRIORS_WITH_INNER_VAE:
            raise ValueError(f"prior {self.prior} has no t-space")
        return self._run("decode_representation",
                         self._decode_representation,
                         np.asarray(t, np.float32))

    def generate(self, n, seed=0):
        """Sample n images from the configured prior (clipped to [0,1])."""
        if self.prior in PRIORS_WITH_GM and self.gm is None:
            raise ValueError("generation with prior='%s' needs "
                             "GM_prior_info.npz (run an accurate fit or pass "
                             "gm_info_path)" % self.prior)
        cfg = self.config
        if n <= 0:
            return np.zeros((0, cfg["dim_input_x"], cfg["dim_input_y"],
                             cfg["dim_input_channel"]), np.float32)
        out = []
        rng = jax.random.PRNGKey(seed)
        remaining = n
        while remaining > 0:
            rng, r = jax.random.split(rng)
            imgs = np.asarray(self._generate(self.params, r, self.gm))
            out.append(imgs[:remaining])
            remaining -= imgs.shape[0]
        return np.concatenate(out, axis=0)

    def t_log_density(self, t):
        """log p_GM(t) under the accurate hyper-prior fit."""
        if self.gm is None:
            raise ValueError("no GM_prior_info.npz loaded")
        return np.asarray(self._t_logpdf(jnp.asarray(t, jnp.float32),
                                         self.gm))

    def warmup(self):
        """Compile every path at every bucket shape — in BOTH accepted image
        dtypes (uint8 and float32 trace to different programs); returns
        seconds taken."""
        cfg = self.config
        t0 = time.perf_counter()
        for b in self.buckets:
            for x in (np.zeros((b, cfg["dim_input_x"], cfg["dim_input_y"],
                                cfg["dim_input_channel"]), np.float32),
                      np.zeros((b, cfg["dim_input_x"], cfg["dim_input_y"],
                                cfg["dim_input_channel"]), np.uint8)):
                self.encode(x)
                self.reconstruct(x)
                if self.prior in PRIORS_WITH_INNER_VAE:
                    self.represent(x)
            self.decode(np.zeros((b, cfg["code_size"]), np.float32))
            if self.prior in PRIORS_WITH_INNER_VAE:
                self.decode_representation(
                    np.zeros((b, cfg["representation_size"]), np.float32))
        try:
            self.generate(1)
        except ValueError:
            pass  # no GM fit on disk — generation unavailable, not an error
        return time.perf_counter() - t0

    @property
    def latency_ema(self):
        """Per-path smoothed wall latency (seconds) of past calls."""
        return dict(self._latency)
