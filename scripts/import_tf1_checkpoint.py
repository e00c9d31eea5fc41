"""Migrate trained reference (TF1) checkpoints to/from ladder_tpu format.

The reference saves two tf.train.Saver files per experiment — vae-model
(encoder/decoder/sigma) and prior-model (prior/inner_sigma), see
/root/reference/codes/base.py:37-65. Given a directory holding them:

    # verify the mapping only (works with index-only checkpoints)
    python scripts/import_tf1_checkpoint.py \
        --config demo/mnist_digit_config.json \
        --src /path/to/pretrained_models/mnist_digit --check

    # convert into this framework's msgpack checkpoint pair
    python scripts/import_tf1_checkpoint.py \
        --config demo/mnist_digit_config.json \
        --src /path/to/pretrained_models/mnist_digit [--dst DIR]

    # reverse: write a reference-loadable TF1 checkpoint pair from the
    # config's checkpoint_dir msgpacks
    python scripts/import_tf1_checkpoint.py \
        --config demo/mnist_digit_config.json --export /tmp/tf1_out

GM_prior_info.npz needs no conversion (identical key set on both sides,
base.py:769-777): copy it into the config's result_dir as-is.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ladder_tpu.utils.config import (honor_cpu_platform_request,  # noqa: E402
                                     process_config)

honor_cpu_platform_request()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--src", help="directory with vae-model.* / "
                                  "prior-model.* TF1 checkpoint files "
                                  "(import) or msgpack pair (--export; "
                                  "default: the config's checkpoint_dir)")
    ap.add_argument("--dst", help="output directory for the msgpack pair "
                                  "(default: the config's checkpoint_dir)")
    ap.add_argument("--check", action="store_true",
                    help="only verify name/shape coverage (no .data "
                         "blobs needed)")
    ap.add_argument("--export", metavar="DIR",
                    help="reverse direction: read the msgpack checkpoints "
                         "and write a TF1 pair into DIR")
    args = ap.parse_args()

    import jax

    from ladder_tpu.models.builder import make_model
    from ladder_tpu.utils import tf1_import
    from ladder_tpu.utils.checkpoint import (PRIOR_KEYS, VAE_KEYS,
                                             load_msgpack, save_msgpack)

    config = process_config(args.config)
    model = make_model(config)
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    groups = ("VAE", "prior") if "prior" in template else ("VAE",)

    if args.export:
        src = args.src or config["checkpoint_dir"]
        params = {}
        for fname in ("vae-model.msgpack", "prior-model.msgpack"):
            path = os.path.join(src, fname)
            if os.path.isfile(path):
                params.update(load_msgpack(path))
        if not params:
            sys.exit(f"no msgpack checkpoints found in {src}")
        written = tf1_import.export_reference_checkpoint(
            params, config, args.export,
            groups=("VAE", "prior") if "prior" in params else ("VAE",))
        print(f"wrote TF1 checkpoint(s) {written} to {args.export}")
        return

    if not args.src:
        sys.exit("--src is required for import/--check")

    if args.check:
        report = tf1_import.check_reference_mapping(
            template, config, args.src, groups=groups)
        ok = True
        for prefix, r in report.items():
            print(f"{prefix}: {len(r['matched'])} variables matched")
            for key in ("missing_in_checkpoint", "unmapped_in_checkpoint",
                        "shape_mismatches"):
                if r[key]:
                    ok = False
                    print(f"  {key}: {r[key]}")
        sys.exit(0 if ok else 1)

    params = tf1_import.import_reference_checkpoint(
        template, config, args.src, groups=groups)
    dst = args.dst or config["checkpoint_dir"]
    os.makedirs(dst, exist_ok=True)
    save_msgpack(os.path.join(dst, "vae-model.msgpack"),
                 {k: params[k] for k in VAE_KEYS if k in params})
    print(f"wrote {os.path.join(dst, 'vae-model.msgpack')}")
    if any(k in params for k in PRIOR_KEYS):
        save_msgpack(os.path.join(dst, "prior-model.msgpack"),
                     {k: params[k] for k in PRIOR_KEYS if k in params})
        print(f"wrote {os.path.join(dst, 'prior-model.msgpack')}")


if __name__ == "__main__":
    main()
