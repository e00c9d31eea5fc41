"""Checkpoint / resume with the reference's two-saver granularity plus a
full-train-state extension.

The reference saves two tf.train.Savers — 'vae-model' (encoder+decoder+sigma)
and 'prior-model' (prior+inner_sigma) — every epoch, restores at startup, and
silently continues when a checkpoint is absent (/root/reference/codes/base.py
:37-85, 853-857). It does NOT checkpoint Adam slots or the sklearn GMM, so a
restart loses optimiser state (SURVEY.md §5). We keep the same two-file
public layout (so vae/prior can be loaded independently) and additionally
write 'train-state' with optimiser moments, the fitted GM, the epoch counter
and the RNG key, giving exact crash-resume.

Format: flax msgpack serialization — single-file, byte-deterministic, no
directory protocol needed for these model sizes (<100 MB).
"""

from __future__ import annotations

import os
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

VAE_KEYS = ("encoder", "decoder", "sigma")
PRIOR_KEYS = ("prior", "inner_sigma")


def _to_host(tree):
    """Materialise every leaf as a host numpy array. Leaves that are not
    fully addressable (multi-process runs where params/moments shard across
    processes — e.g. TP under jax.distributed) are gathered first:
    np.asarray would raise on them."""
    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x,
                                                                tiled=True))
        return np.asarray(x)

    return jax.tree.map(conv, tree)


def save_msgpack(path, tree):
    """Single-writer, collective-safe save: EVERY process must call this
    (the _to_host gather of non-addressable leaves is a collective), but
    only process 0 touches the filesystem — concurrent writers on a shared
    checkpoint dir would race on the tmp file."""
    host_tree = _to_host(tree)
    if jax.process_index() != 0:
        return
    data = serialization.msgpack_serialize(host_tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_msgpack(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class AsyncCheckpointWriter:
    """Single background writer: the device keeps training while the host
    fetches, serialises and writes the checkpoint.

    The hot-path cost of a synchronous save is host-side — device->host
    transfer plus msgpack serialisation plus disk IO of ~3x the parameter
    bytes (params + Adam m/v), during which the accelerator sits idle
    between epochs. The async writer moves all of it off the training
    thread; the only synchronous work left is a device-side `jnp.copy`
    snapshot (HBM-bandwidth fast), which is REQUIRED for correctness, not
    just speed: the train step donates its state buffers
    (training/step.py donate_argnums), so by the time the writer fetches,
    the original arrays may already be invalidated.

    One worker thread + a bounded queue keeps writes ordered and applies
    backpressure (at most `depth` checkpoint snapshots alive at once).
    Writer errors surface on the next submit() or flush() — a failing
    disk must not be silent."""

    def __init__(self, depth=2):
        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            try:
                fn()
            except BaseException as e:  # propagate via flush/submit
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        # STICKY: once a write fails, every later submit()/flush() fails
        # too until reset_error() — a checkpoint stream with a hole in it
        # must never look healthy again by itself (a later flush()
        # returning success would claim disk state the failed write never
        # produced).
        if self._err is not None:
            raise RuntimeError(
                "async checkpoint write failed (sticky until reset_error())"
            ) from self._err

    def reset_error(self):
        """Explicitly acknowledge a failed write and resume the stream."""
        self._err = None

    def submit(self, fn):
        self._check()
        self._q.put(fn)

    def flush(self):
        """Block until every submitted write hit disk; re-raise failures."""
        self._q.join()
        self._check()


def _snapshot(tree):
    """Device-side copy of every jax leaf (donation-safe, ~free at HBM
    bandwidth); host leaves are copied on the host."""
    def snap(x):
        if isinstance(x, jax.Array):
            return jnp.copy(x)
        if isinstance(x, np.ndarray):
            return x.copy()
        return x

    return jax.tree.map(snap, tree)


class CheckpointManager:
    def __init__(self, config):
        self.config = config
        ckdir = config["checkpoint_dir"]
        self.path_vae = os.path.join(ckdir, "vae-model.msgpack")
        self.path_prior = os.path.join(ckdir, "prior-model.msgpack")
        self.path_state = os.path.join(ckdir, "train-state.msgpack")
        self._writer = None

    def _async_enabled(self):
        """config['async_checkpoint']=1 moves fetch+serialise+IO to a
        background thread. Multi-process runs stay synchronous: _to_host's
        process_allgather is a collective, and collectives must issue in
        one deterministic order per process — a side thread racing the
        training thread's collectives could deadlock the cluster. The
        orbax backend likewise stays synchronous (it has its own async
        machinery upstream)."""
        return (bool(self.config.get("async_checkpoint"))
                and jax.process_count() == 1
                and self.config.get("checkpoint_backend") != "orbax")

    def _write_msgpack(self, path, tree, done_msg=None):
        """done_msg, when given, is printed only AFTER the bytes are on
        disk — in async mode that means inside the writer thread, so the
        log never claims success for a write that later fails."""
        if not self._async_enabled():
            save_msgpack(path, tree)
            if done_msg:
                print(done_msg)
            return
        if self._writer is None:
            self._writer = AsyncCheckpointWriter()
        snap = _snapshot(tree)

        def _write():
            save_msgpack(path, snap)
            if done_msg:
                print(done_msg)

        self._writer.submit(_write)

    def flush(self):
        """Wait for pending async writes (no-op when synchronous). Call
        before reading any checkpoint this manager may have written, and
        when train() returns — its artifact contract is 'on disk'."""
        if self._writer is not None:
            self._writer.flush()

    # -- reference-parity two-group save/load (base.py:51-85) ----------
    def save(self, state, model="joint"):
        print("Saving model...")
        params = state["params"]
        cfg = self.config
        has_prior = cfg["prior"] in ("ours", "hierarchical", "vampPrior")
        if model in ("VAE", "joint") and (model == "VAE"
                                          or cfg["TRAIN_VAE"] == 1):
            self._write_msgpack(self.path_vae,
                                {k: params[k] for k in VAE_KEYS
                                 if k in params},
                                done_msg="Outer VAE model saved.")
        if has_prior and (model == "prior"
                          or (model == "joint" and cfg["TRAIN_prior"] == 1)):
            self._write_msgpack(self.path_prior,
                                {k: params[k] for k in PRIOR_KEYS
                                 if k in params},
                                done_msg="Prior model saved.")

    def load(self, state, model):
        """Merge saved params into state; soft-fail like base.py:68-85."""
        self.flush()  # read-after-write: pending async saves land first
        print("\ncheckpoint_dir to be loaded:\n{}\n".format(
            self.config["checkpoint_dir"]))
        path = self.path_vae if model == "VAE" else self.path_prior
        if not os.path.isfile(path):
            print(f"No {'outer VAE' if model == 'VAE' else 'prior'} model "
                  f"found. No {model} model loaded.")
            return state
        saved = load_msgpack(path)
        params = dict(state["params"])
        for k, v in saved.items():
            if k in params:
                params[k] = serialization.from_state_dict(params[k], v)
        print(f"{'Outer VAE' if model == 'VAE' else 'Prior'} model loaded.")
        return {**state, "params": params}

    # -- full-state extension ------------------------------------------
    def save_full(self, state, extra=None):
        """extra: dict of host-side state (gm params, epoch, rng key...).

        Backend selectable via config['checkpoint_backend']: 'msgpack'
        (default; single-file flax serialization) or 'orbax'
        (orbax.checkpoint PyTree directory layout — the multi-host-capable
        path for pod-scale runs, SURVEY.md §7 build plan item 9)."""
        payload = {"state": state, "extra": extra or {}}
        if self.config.get("checkpoint_backend") == "orbax":
            self._orbax_save(payload)
        else:
            self._write_msgpack(self.path_state, payload)

    def load_full(self, state_template):
        self.flush()  # read-after-write: pending async saves land first
        if self.config.get("checkpoint_backend") == "orbax":
            raw = self._orbax_load()
            if raw is None:
                return None
        elif os.path.isfile(self.path_state):
            raw = load_msgpack(self.path_state)
        else:
            return None
        state = serialization.from_state_dict(
            state_template, raw["state"])
        return state, raw.get("extra", {})

    # -- orbax backend --------------------------------------------------
    def _orbax_dir(self):
        return os.path.abspath(os.path.join(self.config["checkpoint_dir"],
                                            "train-state-orbax"))

    def _orbax_save(self, payload):
        import orbax.checkpoint as ocp

        # same single-writer discipline as save_msgpack: the payload is
        # gathered to host on every process (collective), written by one
        host_payload = _to_host(payload)
        if jax.process_index() != 0:
            return
        path = self._orbax_dir()
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, host_payload, force=True)

    def _orbax_load(self):
        import orbax.checkpoint as ocp

        path = self._orbax_dir()
        if not os.path.isdir(path):
            return None
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(path)


def save_gm_prior_info(result_dir, weights, means, covs,
                       active_threshold=None):
    """Persist the accurate GM fit as GM_prior_info.npz with both active-only
    (renormalised) and full parameter sets (base.py:768-777)."""
    if active_threshold is None:
        from ladder_tpu.ops.gmm import ACTIVE_WEIGHT_THRESHOLD
        active_threshold = ACTIVE_WEIGHT_THRESHOLD
    w = np.asarray(weights)
    m = np.asarray(means)
    K = np.asarray(covs)
    idx = np.where(w >= active_threshold)[0]
    w_active = w[idx]
    w_active = w_active / w_active.sum() if w_active.size else w_active
    filename = os.path.join(result_dir, "GM_prior_info.npz")
    np.savez(filename, w_active=w_active, m_active=m[idx], K_active=K[idx],
             w_full=w, m_full=m, K_full=K)
    return filename
