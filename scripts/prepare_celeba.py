"""Build celebA_{train,val,test}.tfrecords from a directory of images.

The reference expects pre-built TFRecords (its load_celebA_dataset is a
stub, /root/reference/codes/data_loader.py:63-65, and the tfrecord layout is
implied by models.py:354-367: one Example per image, feature 'X' = raw uint8
bytes of the HxWxC array). This utility produces that exact layout from raw
CelebA images: center-crop to square, resize to --size (bilinear), split
180k/20k/rest by filename order (the reference's split sizes,
data_loader.py:16-17).

Usage:
    python scripts/prepare_celeba.py --images /path/to/img_align_celeba \
        --out ./data/celeba/ [--size 128] [--n-train 180000] [--n-val 20000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_and_preprocess(path, size):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    s = min(w, h)
    left, top = (w - s) // 2, (h - s) // 2
    img = img.crop((left, top, left + s, top + s))
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="directory of celebA jpg/png files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n-train", type=int, default=180000)
    ap.add_argument("--n-val", type=int, default=20000)
    ap.add_argument("--n-test", type=int, default=None,
                    help="default: whatever remains (>=1 batch recommended)")
    args = ap.parse_args()

    from ladder_tpu.data.tfrecord import encode_example_bytes, write_tfrecords

    files = sorted(
        f for f in os.listdir(args.images)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not files:
        raise SystemExit(f"no images found in {args.images}")
    os.makedirs(args.out, exist_ok=True)

    n_train = min(args.n_train, len(files))
    n_val = min(args.n_val, len(files) - n_train)
    n_test = (len(files) - n_train - n_val if args.n_test is None
              else min(args.n_test, len(files) - n_train - n_val))
    splits = [("celebA_train.tfrecords", files[:n_train]),
              ("celebA_val.tfrecords", files[n_train:n_train + n_val]),
              ("celebA_test.tfrecords",
               files[n_train + n_val:n_train + n_val + n_test])]

    for name, split_files in splits:
        out_path = os.path.join(args.out, name)

        def payloads():
            for i, f in enumerate(split_files):
                img = load_and_preprocess(os.path.join(args.images, f),
                                          args.size)
                if i % 10000 == 0:
                    print(f"{name}: {i}/{len(split_files)}", flush=True)
                yield encode_example_bytes("X", img.tobytes())

        write_tfrecords(out_path, payloads())
        print(f"wrote {len(split_files)} records to {out_path}")


if __name__ == "__main__":
    main()
