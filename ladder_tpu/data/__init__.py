from ladder_tpu.data.mnist import (
    DataGenerator,
    balanced_counts,
    build_balanced_test_batch,
    epoch_batches,
    synthetic_mnist,
)

__all__ = [
    "DataGenerator",
    "balanced_counts",
    "build_balanced_test_batch",
    "epoch_batches",
    "synthetic_mnist",
]
