"""CLI entry point: python train.py --config codes/mnist_digit_config.json

API parity with the reference driver (/root/reference/train.py): the same
--config flag, the same JSON schema, model/trainer dispatch on exp_name,
checkpoint restore before training, then the epoch loop. TPU-native runtime
underneath: jitted fused train step, on-device GM fitting, optional
data-parallel mesh (config['mesh_shape']).
"""

import os
import sys

from ladder_tpu.utils.config import (
    create_dirs,
    get_args,
    process_config,
    save_config,
)

from ladder_tpu.utils.config import honor_cpu_platform_request

honor_cpu_platform_request()


def main(argv=None):
    try:
        args = get_args(argv)
        config = process_config(args.config)
    except SystemExit:
        raise
    except Exception as e:
        print("missing or invalid arguments: {}".format(e))
        sys.exit(0)

    # multi-host launch: LADDER_DISTRIBUTED=1 on every process (coordinator
    # discovery via jax.distributed's cluster auto-detection — TPU pod
    # metadata, Slurm, or the JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID env triplet). Must run before any device use; the
    # trainer gates all file writes on process 0 (training/trainer.py).
    if os.environ.get("LADDER_DISTRIBUTED"):
        import jax
        jax.distributed.initialize()
        print("jax.distributed: process {}/{} with {} local of {} global "
              "devices".format(jax.process_index(), jax.process_count(),
                               len(jax.local_devices()), len(jax.devices())))

    import jax

    create_dirs([config["result_dir"], config["checkpoint_dir"]])
    if jax.process_index() == 0:
        save_config(config)

    from ladder_tpu.utils.config import enable_compilation_cache
    enable_compilation_cache()

    from ladder_tpu.data.mnist import DataGenerator
    from ladder_tpu.models.builder import make_model
    from ladder_tpu.parallel.mesh import make_mesh

    if config["exp_name"] == "celeba":
        from ladder_tpu.data.celeba import CelebAData
        data = CelebAData(config)
    else:
        data = DataGenerator(config)
    model = make_model(config)
    print("Created a VAE model.")
    print("The current dataset is {}, num hidden units: {}.\n".format(
        config["exp_name"], config["num_hidden_units"]))

    mesh = None
    if config.get("mesh_shape") and len(jax.devices()) > 1:
        mesh = make_mesh(config)
        print("Data-parallel mesh: {}".format(mesh))

    if config["TRAIN_VAE"] or config["TRAIN_sigma"] or config["TRAIN_prior"]:
        if config["exp_name"] in ("mnist_digit", "mnist_fashion"):
            from ladder_tpu.training.trainer import MNISTTrainer
            trainer = MNISTTrainer(model, data, config, mesh=mesh)
        elif config["exp_name"] == "celeba":
            from ladder_tpu.training.celeba_trainer import CelebATrainer
            trainer = CelebATrainer(model, data, config, mesh=mesh)
        else:
            raise ValueError(config["exp_name"])

        if config.get("load_model", 1):
            trainer.restore()

        if config["num_epochs"] > 0:
            trainer.train()


if __name__ == "__main__":
    main()
