"""CelebA-128 data source: indexed TFRecord reading, shuffled epoch
iteration, background prefetch, synthetic dataset generation.

The reference builds two tf.data pipelines over celebA_{train,val,test}
.tfrecords (/root/reference/codes/models.py:346-390) with a 1000+3B shuffle
buffer. Here the indexed reader (ladder_tpu.data.tfrecord) gives true
full-dataset shuffles: a numpy permutation over record offsets per epoch, a
background thread assembling uint8 batches (double-buffered), and on-device
/255 normalisation inside the jitted step.

Set config['synthetic_data']=1 to generate deterministic celebA-shaped
TFRecords on first use (tests and benchmarks; no dataset download exists in
this environment).
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from ladder_tpu.data.tfrecord import ImageRecordReader, write_image_tfrecords


def synthetic_celeba_images(n, seed=0, size=128, chunk=128):
    """Deterministic face-like images: smooth multi-scale colour blobs.
    uint8 [N,size,size,3].

    The rng draw order and per-blob accumulation order match the original
    per-image loop exactly (same dataset per seed); the heavy field math is
    vectorised over image chunks — ~20x faster, which matters when a
    CelebA-sized synthetic set (10k+ images) is generated at run start."""
    rng = np.random.default_rng(seed)
    params = np.empty((n, 6, 7), np.float32)
    for i in range(n):
        for b in range(6):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            sx, sy = rng.uniform(0.05, 0.3, 2)
            color = rng.uniform(0, 1, 3)
            params[i, b] = (cx, cy, sx, sy, *color)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    for s in range(0, n, chunk):
        p = params[s:s + chunk]                              # [B,6,7]
        cx = p[..., 0][..., None, None]
        cy = p[..., 1][..., None, None]
        sx = p[..., 2][..., None, None]
        sy = p[..., 3][..., None, None]
        blob = np.exp(-((xx[None, None] - cx) ** 2 / (2 * sx ** 2)
                        + (yy[None, None] - cy) ** 2 / (2 * sy ** 2)))
        img = np.zeros((p.shape[0], size, size, 3), np.float32)
        for b in range(6):                                   # keep add order
            img += blob[:, b, :, :, None] * p[:, b, None, None, 4:7]
        img /= np.maximum(img.max(axis=(1, 2, 3), keepdims=True), 1e-6)
        out[s:s + chunk] = (img * 255).astype(np.uint8)
    return out


def ensure_synthetic_tfrecords(data_path, n_train=512, n_val=128, n_test=64,
                               seed=0, size=128):
    """Create celebA_{train,val,test}.tfrecords under data_path if absent."""
    os.makedirs(data_path, exist_ok=True)
    specs = [("celebA_train.tfrecords", n_train, seed),
             ("celebA_val.tfrecords", n_val, seed + 1),
             ("celebA_test.tfrecords", n_test, seed + 2)]
    for name, n, s in specs:
        path = os.path.join(data_path, name)
        if not os.path.isfile(path):
            write_image_tfrecords(path, synthetic_celeba_images(n, seed=s,
                                                                size=size))
    return data_path


class Prefetcher:
    """Background-thread batch assembly with a bounded queue (depth 2 =
    double buffering): the host reads/decodes batch k+1 while the device
    runs step k."""

    def __init__(self, fn, idx_batches, depth=2):
        self.q = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for idxs in idx_batches:
                    self.q.put(fn(idxs))
            except Exception as e:  # pragma: no cover
                self._err = e
            finally:
                self.q.put(None)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                if self._err:
                    raise self._err
                return
            yield item


class CelebARecords:
    """Epoch iteration over one TFRecord split.

    Uses the native C++ reader (ladder_tpu.runtime: mmap + thread-pool batch
    decode) when the toolchain is available, else the pure-Python mmap
    reader. Both produce identical uint8 batches (tested)."""

    def __init__(self, path, shape=(128, 128, 3), prefer_native=True):
        self.reader = None
        if prefer_native:
            try:
                from ladder_tpu.runtime import (
                    NativeImageRecordReader,
                    native_available,
                )
                if native_available():
                    self.reader = NativeImageRecordReader(path, shape)
            except Exception:
                self.reader = None
        if self.reader is None:
            self.reader = ImageRecordReader(path, shape)
        self.n = len(self.reader)

    def epoch(self, batch_size, seed, drop_remainder=True, prefetch=True,
              to_device=False, sharding=None, place=None):
        """to_device=True moves the host->HBM transfer into the prefetch
        thread (double-buffered), overlapping it with the device step —
        essential when transfer latency rivals step time. Pass a sharding to
        place batches sharded across a mesh, or a `place` callable for
        custom placement (e.g. multi-process global-batch assembly, which a
        plain device_put-with-sharding cannot express)."""
        perm = np.random.default_rng(seed).permutation(self.n)
        n_batches = (self.n // batch_size if drop_remainder
                     else -(-self.n // batch_size))
        idx_batches = [perm[i * batch_size:(i + 1) * batch_size]
                       for i in range(n_batches)]

        if to_device:
            import jax

            def fetch(ix):
                batch = self.reader.read_batch(ix)
                if place is not None:
                    return place(batch)
                if sharding is not None:
                    return jax.device_put(batch, sharding)
                return jax.device_put(batch)
        else:
            fetch = self.reader.read_batch

        if prefetch:
            return iter(Prefetcher(fetch, idx_batches))
        return (fetch(ix) for ix in idx_batches)

    def first_batch(self, batch_size):
        """Sequential head batch (the reference's test batch is the first
        batch of celebA_test.tfrecords, trainers.py:134-136)."""
        return self.reader.read_batch(np.arange(min(batch_size, self.n)))


class CelebAData:
    """Bundles the three splits; resolves synthetic generation."""

    def __init__(self, config):
        cfg = config
        shape = (cfg["dim_input_x"], cfg["dim_input_y"],
                 cfg["dim_input_channel"])
        data_path = cfg.get("data_path") or os.environ.get(
            "LADDER_DATA_DIR", "./data/celeba/")
        if cfg.get("synthetic_data"):
            ensure_synthetic_tfrecords(
                data_path,
                n_train=cfg.get("synthetic_n_train", 512),
                n_val=cfg.get("synthetic_n_val", 128),
                n_test=cfg.get("synthetic_n_test", 64),
                seed=cfg.get("seed", 0), size=shape[0])
        self.train = CelebARecords(
            os.path.join(data_path, "celebA_train.tfrecords"), shape)
        self.val = CelebARecords(
            os.path.join(data_path, "celebA_val.tfrecords"), shape)
        self.test = CelebARecords(
            os.path.join(data_path, "celebA_test.tfrecords"), shape)
        self.n_train = self.train.n
        self.n_val = self.val.n
