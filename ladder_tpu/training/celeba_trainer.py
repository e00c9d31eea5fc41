"""CelebA joint trainer (reference CelebATrainer_joint_training,
/root/reference/codes/trainers.py:130-248): TFRecord-streamed batches, the
fixed test batch from celebA_test.tfrecords, staircase lr (/1,/2,/5,/10 at
epochs 25/50/75 with restarted 0.99 decay), mid-epoch reconstruction
checkpoints at idx_check_point, validation from celebA_val.tfrecords."""

from __future__ import annotations

import numpy as np

from ladder_tpu.training import schedules
from ladder_tpu.training.trainer import JointTrainer
from ladder_tpu.utils import plotting


class CelebATrainer(JointTrainer):
    def __init__(self, model, data, config, mesh=None):
        super().__init__(model, data, config, mesh)
        self._test_batch = self.data.test.first_batch(config["batch_size"])
        n_iter = self.n_train_iter()
        step = max(n_iter // max(config["num_iter_to_plot"], 1), 1)
        self.idx_check_point = np.arange(0, n_iter - 1, step)

    def current_lr_ae(self):
        return schedules.lr_ae_celeba(self.config, self.cur_epoch)

    def train_batches(self):
        # transfer inside the prefetch thread: decode AND host->HBM copy of
        # batch k+1 overlap the device step k; _place handles mesh sharding
        # and multi-process global-batch assembly
        return self.data.train.epoch(self.config["batch_size"],
                                     seed=self.cur_epoch, to_device=True,
                                     place=self._place)

    def val_batches(self):
        return self.data.val.epoch(self.config["batch_size"],
                                   seed=self.cur_epoch, to_device=True,
                                   place=self._place)

    def sample_batches(self, n_samples):
        bs = self.config["batch_size"]
        n_batch = max(n_samples // bs, 1)
        # prefetch=False: this iterator is abandoned after n_batch of a full
        # epoch, and the Prefetcher worker has no cancellation — each GM fit
        # would otherwise leak a blocked thread + its buffered batches
        gen = self.data.train.epoch(bs, seed=self.cur_epoch * 7919 + 1,
                                    prefetch=False)
        for i, b in enumerate(gen):
            if i >= n_batch:
                return
            yield b

    def test_batch(self):
        return self._test_batch

    def n_train_iter(self):
        return self.data.n_train // self.config["batch_size"]

    def n_val_iter(self):
        return max(self.data.n_val // self.config["batch_size"], 1)

    def val_vae_enabled(self):
        """CelebA gates VAE validation on TRAIN_VAE (trainers.py:180)."""
        return self.config["TRAIN_VAE"] == 1

    def val_prior_enabled(self):
        """CelebA additionally gates the prior val record on TRAIN_prior
        (trainers.py:183)."""
        return self.config["TRAIN_prior"] == 1

    def append_val_average(self, val_loss_sum, n_val):
        """CelebA divides by n_val_iter unconditionally (trainers.py:186):
        with TRAIN_VAE=0 the epoch average is recorded as 0.0, exactly as
        the reference does."""
        self.metrics.val_loss_ave_epoch.append(
            val_loss_sum / self.n_val_iter())

    def mid_epoch_hook(self, idx_iter, span=1):
        """Reconstruction snapshots at checkpoints inside the epoch
        (trainers.py:156-158). With steps_per_call>1 the hook fires once per
        K-step dispatch with span=K: any checkpoint index inside the window
        produces its snapshot then (the parameters are <=K-1 steps past the
        exact index; same artifact set as the reference)."""
        if not (self.plots_enabled and self.config["num_iter_to_plot"] > 1):
            return
        lo = idx_iter - span + 1
        hits = self.idx_check_point[(self.idx_check_point >= lo)
                                    & (self.idx_check_point <= idx_iter)]
        if hits.size == 0:
            return
        self.test_step(self._test_batch, print_result=False)
        for h in hits:
            plotting.plot_interleaved_recon(
                np.asarray(self._test_batch, dtype=np.float32) / 255.0,
                self.output_test, self.config["result_dir"],
                self.cur_epoch, int(h), self.config["batch_size"])

    def epoch_tail_plots(self):
        pass  # CelebA plots happen mid-epoch at the checkpoints
