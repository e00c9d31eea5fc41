"""FID evaluation CLI — the reference's standalone FID utility as a script.

The reference exposes FID only as a function you call by hand
(`compute_FID_score`, /root/reference/codes/utils.py:141-200: load two npz
image sets, resize, InceptionV3/VGG16 imagenet features, Frechet distance).
This wraps the same pipeline (ladder_tpu/utils/fid.py) with a CLI:

    python scripts/eval_fid.py real.npz generated.npz
    python scripts/eval_fid.py real.npz generated.npz --network VGG --pooling max
    python scripts/eval_fid.py a.npz b.npz --second-set original
    # model-space FID with the trained encoder as the extractor (works
    # offline — no ImageNet weights needed):
    python scripts/eval_fid.py real.npz gen.npz --network encoder \
        --config codes/mnist_digit_config.json

npz files hold images under the key 'sampled_images' (what the trainer's
generation path writes, reference base.py:1147-1168); the first set is
treated as original data (/255 then [-1,1]), the second as generated
([0,1]-clipped then [-1,1]) unless --second-set original.

Prints one JSON line {"fid": ..., "network": ..., ...} on success.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="FID between two npz image sets")
    ap.add_argument("data_file1", help="npz with 'sampled_images' (original)")
    ap.add_argument("data_file2", help="npz with 'sampled_images'")
    ap.add_argument("--network", default="inception",
                    choices=["inception", "VGG", "encoder"],
                    help="feature extractor: ImageNet InceptionV3/VGG16 "
                         "(need cached torchvision weights) or the trained "
                         "LaDDer encoder (--config; offline-capable)")
    ap.add_argument("--pooling", default="avg", choices=["avg", "max"],
                    help="global pooling of the extractor features "
                         "(reference pooling_option)")
    ap.add_argument("--second-set", default="generated",
                    choices=["generated", "original"],
                    help="preprocessing for the second set")
    ap.add_argument("--key", default="sampled_images",
                    help="npz array key (default: sampled_images)")
    ap.add_argument("--resize-to", type=int, default=64,
                    help="common resize before feature extraction "
                         "(reference: 64)")
    ap.add_argument("--feature-size", type=int, default=140,
                    help="inception input resize (reference: 140)")
    ap.add_argument("-c", "--config", default=None,
                    help="training config JSON (required for "
                         "--network encoder)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="checkpoint dir override for --network encoder")
    args = ap.parse_args(argv)

    from ladder_tpu.utils.config import honor_cpu_platform_request
    honor_cpu_platform_request()

    from ladder_tpu.utils.fid import compute_FID_score, encoder_feature_fn

    feature_fn = None
    if args.network == "encoder":
        if args.config is None:
            ap.error("--network encoder requires --config")
        from ladder_tpu.utils.config import process_config
        cfg = process_config(args.config)
        feature_fn = encoder_feature_fn(
            cfg, checkpoint_dir=args.checkpoint_dir)

    score = compute_FID_score(
        args.data_file1, args.data_file2, feature_fn=feature_fn,
        second_set=args.second_set, key=args.key, resize_to=args.resize_to,
        feature_size=args.feature_size, network=args.network,
        pooling=args.pooling)
    print(json.dumps({
        "fid": score, "network": args.network, "pooling": args.pooling,
        "second_set": args.second_set,
        "files": [args.data_file1, args.data_file2],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
