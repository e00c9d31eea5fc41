"""Host-side input-pipeline throughput benchmark (no device in the loop).

Answers the question the tunneled dev chip cannot: can the HOST feed the
device at its measured step rate? The headline CelebA recipe consumes one
uint8 batch of 64 images per ~12.24 ms step = ~5,230 img/s = ~257 MB/s of
host->HBM traffic. A streamed training run sustains

    streamed rate = min(host pipeline, transfer link, device step rate)

and this script measures the host-pipeline term our framework owns —
indexed TFRecord read + Example decode + shuffled batch assembly (the
native C++ reader, ladder_tpu/runtime/tfrecord_reader.cc, and the
pure-Python mmap reader) plus the prefetch-thread handoff
(ladder_tpu/data/celeba.py:Prefetcher). The transfer link is the one term
this environment cannot measure honestly: the axon tunnel moves ~27 MB/s
where local PCIe moves GB/s (docs/DESIGN.md; BENCH detail.streamed).

Reference counterpart: the tf.data pipelines of
/root/reference/codes/models.py:346-390 (TFRecordDataset -> parse ->
reshape -> /255 on the host, float32 feed = 4x our uint8 bytes).

Usage: python scripts/bench_input_pipeline.py [--n-images 4096]
           [--batch 64] [--size 128] [--repeats 3] [--threads N]
Prints ONE JSON line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ladder_tpu.data.celeba import Prefetcher, ensure_synthetic_tfrecords
from ladder_tpu.data.tfrecord import ImageRecordReader

# the measured v5e step time of the headline batch-64 recipe (DESIGN 6f)
HEADLINE_STEP_MS = 12.24
HEADLINE_BATCH = 64


def _epoch_rate(reader, n, batch, rng):
    """One shuffled epoch of read_batch; returns (img_s, mb_s)."""
    perm = rng.permutation(n)
    n_batches = n // batch
    t0 = time.perf_counter()
    for i in range(n_batches):
        reader.read_batch(perm[i * batch:(i + 1) * batch])
    dt = time.perf_counter() - t0
    imgs = n_batches * batch
    img_bytes = int(np.prod(reader.shape))
    return imgs / dt, imgs * img_bytes / dt / 1e6


def _prefetch_rate(reader, n, batch, rng):
    """Rate as delivered through the double-buffered prefetch thread."""
    perm = rng.permutation(n)
    n_batches = n // batch
    idx_batches = [perm[i * batch:(i + 1) * batch] for i in range(n_batches)]
    t0 = time.perf_counter()
    got = 0
    for b in Prefetcher(reader.read_batch, idx_batches):
        got += len(b)
    dt = time.perf_counter() - t0
    assert got == n_batches * batch
    return got / dt


def bench_reader(make_reader, n, batch, repeats, seed=0):
    reader = make_reader()
    rng = np.random.default_rng(seed)
    _epoch_rate(reader, n, batch, rng)          # warm (page cache, pools)
    rates = [_epoch_rate(reader, n, batch, rng) for _ in range(repeats)]
    img_s = sorted(r[0] for r in rates)[repeats // 2]
    mb_s = sorted(r[1] for r in rates)[repeats // 2]
    pf = sorted(_prefetch_rate(reader, n, batch, rng)
                for _ in range(repeats))[repeats // 2]
    return {"img_s": round(img_s, 1), "mb_s": round(mb_s, 1),
            "prefetch_img_s": round(pf, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--threads", type=int, default=None,
                    help="native reader decode threads (default: cpu count)")
    ap.add_argument("--records", default=None,
                    help="existing TFRecord file (default: synthesize)")
    args = ap.parse_args()

    shape = (args.size, args.size, 3)
    if args.records:
        path = args.records
    else:
        tmp = tempfile.mkdtemp(prefix="ladder_input_bench_")
        ensure_synthetic_tfrecords(tmp, n_train=args.n_images, n_val=1,
                                   n_test=1, size=args.size)
        path = os.path.join(tmp, "celebA_train.tfrecords")

    probe = ImageRecordReader(path, shape)
    n = (len(probe) // args.batch) * args.batch
    out = {
        "n_images": n, "batch": args.batch, "image_shape": list(shape),
        "host_cpus": os.cpu_count(),
        "python": bench_reader(lambda: ImageRecordReader(path, shape),
                               n, args.batch, args.repeats),
    }
    probe.close()

    try:
        from ladder_tpu.runtime import NativeImageRecordReader, native_available
        if native_available():
            out["native"] = bench_reader(
                lambda: NativeImageRecordReader(path, shape,
                                                n_threads=args.threads),
                n, args.batch, args.repeats)
    except Exception as e:  # pragma: no cover - no-compiler environments
        out["native_error"] = str(e)

    # what the device side needs: scale the headline step to this batch size
    step_s = HEADLINE_STEP_MS / 1e3 * (args.batch / HEADLINE_BATCH)
    need_img_s = args.batch / step_s
    out["device_ceiling_img_s"] = round(need_img_s, 1)
    out["required_transfer_mb_s"] = round(
        need_img_s * int(np.prod(shape)) / 1e6, 1)
    best = out.get("native", out["python"])["img_s"]
    out["host_headroom_x"] = round(best / need_img_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
