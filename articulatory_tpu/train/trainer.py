"""Trainer: the step/eval/checkpoint loop (reference bin/train.py:70-777).

Behavioral parity:
- gen/disc alternation with start-step gating lives in the jitted step;
- schedulers advance once per train step, gated like the reference
  (train.py:372-383, 429-435), with ReduceLROnPlateau fed the current loss;
- intervals: log every ``log_interval_steps`` (averaged then reset), eval
  every ``eval_interval_steps``, checkpoint every ``save_interval_steps``,
  stop at ``train_max_steps``; interval work is rank-0 only;
- best dev ``eval/mel_loss`` tracked into ``best_mel_ckpt.pkl`` +
  ``best_mel_step.txt`` (train.py:633-638);
- intermediate ref/gen plots + wavs for the first eval batch (:650-745).

TPU specifics: metric accumulation stays on device between log intervals
(no per-step host sync); batches are sharded over the mesh's ``data`` axis
and the state is replicated, so the same code runs 1-chip or N-chip.
"""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from articulatory_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from articulatory_tpu.utils.checkpoint import save_checkpoint
from articulatory_tpu.utils.io import write_wav

# keys the jitted step consumes; the collater's extra aliases (audio/art
# duplicate x/y) would otherwise be transferred to device every step
_STEP_BATCH_KEYS = ("x", "y", "ar", "ar2", "spk_id", "ph", "mel",
                    "pitch", "periodicity")


def _step_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if k in _STEP_BATCH_KEYS}


class Trainer:
    def __init__(self, *, config: dict, state, train_step, eval_step,
                 schedulers: dict, data_loader: dict, outdir: str,
                 mesh=None, steps: int = 0, epochs: int = 0, seed: int = 0,
                 writer=None):
        self.config = config
        self.state = state
        self.train_step = train_step
        self.eval_step = eval_step
        self.schedulers = schedulers
        self.data_loader = data_loader
        self.outdir = outdir
        self.mesh = mesh if mesh is not None else make_mesh()
        self.steps = steps
        self.epochs = epochs
        self.finish_train = False
        self.rng = jax.random.PRNGKey(seed)
        self.total_train_loss: dict = defaultdict(float)
        self._train_count = 0
        self.total_eval_loss: dict = defaultdict(float)
        # The reference resets its best-eval/mel tracker on every launch
        # (train.py:114), so a --resume continuation can clobber a better
        # best_mel_ckpt.pkl with a worse one. We persist the best loss as a
        # second field in best_mel_step.txt and restore it here.
        self.best_mel_loss = 1.0e6
        best_p = os.path.join(outdir, "best_mel_step.txt") if outdir else None
        if best_p and os.path.exists(best_p):
            try:
                fields = open(best_p).read().split()
                if len(fields) >= 2:
                    self.best_mel_loss = float(fields[1])
                    logging.info(f"restored best eval/mel_loss "
                                 f"{self.best_mel_loss:.4f} (step {fields[0]})")
            except (ValueError, OSError):
                pass
        if jax.process_count() > 1:
            # only process 0 writes best_mel_step.txt; with per-host outdirs
            # the other ranks would keep 1e6 and the collective best-mel
            # checkpoint decision would diverge (deadlocking orbax saves) —
            # broadcast rank 0's restored value to everyone
            from jax.experimental import multihost_utils

            self.best_mel_loss = float(multihost_utils.broadcast_one_to_all(
                np.float32(self.best_mel_loss)))
        self._profiling = False
        self._pending_sched: dict = {}
        self.is_host = jax.process_index() == 0
        if writer is not None:
            self.writer = writer
        elif self.is_host:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(outdir)
        else:
            self.writer = None
        self._last_log_time = time.time()
        self._gen_sched_plateau = type(schedulers.get("generator")).__name__ == "ReduceLROnPlateau"
        self._dis_sched_plateau = type(schedulers.get("discriminator")).__name__ == "ReduceLROnPlateau"

    # ------------------------------------------------------------------ run
    def run(self):
        self._install_preemption_handler()
        try:
            while not self.finish_train:
                self._train_epoch()
        finally:
            if self._profiling:
                # training ended inside the profile window — flush the trace
                from jax import profiler as jax_profiler

                jax_profiler.stop_trace()
                self._profiling = False
            self.save_checkpoint(
                os.path.join(self.outdir, f"checkpoint-{self.steps}steps.ckpt"))
            logging.info(f"Successfully saved checkpoint @ {self.steps} steps.")

    @property
    def _pbar(self):
        if not hasattr(self, "_pbar_obj"):
            if self.is_host:
                from tqdm import tqdm

                self._pbar_obj = tqdm(initial=self.steps,
                                      total=self.config["train_max_steps"],
                                      desc="[train]")
            else:
                self._pbar_obj = None
        return self._pbar_obj

    def _install_preemption_handler(self):
        """SIGTERM (TPU-VM preemption notice) -> finish the current step,
        checkpoint, and exit cleanly so --resume can pick up. The reference
        only has the try/finally save (train.py:1841-1847); preemptible TPU
        fleets need the signal path."""
        import signal

        def _on_sigterm(signum, frame):
            logging.warning("SIGTERM received: checkpointing and stopping.")
            self.finish_train = True

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not in main thread (e.g. tests)

    def _train_epoch(self):
        for batch in self.data_loader["train"]:
            self._train_step(batch)
            # Interval *output* (logging, tensorboard, plots) is rank-0 only,
            # mirroring the reference (train.py:449-452) — but under global-
            # mesh SPMD the eval/checkpoint *computation* must run on every
            # process (eval_step and orbax saves contain collectives; a
            # host-0-only call would deadlock the other hosts).
            if self.is_host:
                self._check_log_interval()
            self._check_eval_interval()
            self._check_save_interval()
            if self.finish_train:
                return
        self.epochs += 1
        if hasattr(self.data_loader["train"], "set_epoch"):
            self.data_loader["train"].set_epoch(self.epochs)

    def _train_step(self, batch):
        # optional jax.profiler trace window: config `profile_steps: [lo, hi]`
        prof = self.config.get("profile_steps")
        if prof and self.is_host:
            from jax import profiler as jax_profiler

            # range-based + stateful so a --resume landing inside the window
            # still traces, and never stop without a matching start
            if (not self._profiling
                    and int(prof[0]) <= self.steps < int(prof[1])):
                jax_profiler.start_trace(os.path.join(self.outdir, "profile"))
                self._profiling = True
                logging.info(f"profiler trace started @ step {self.steps}")
            elif self._profiling and self.steps >= int(prof[1]):
                jax_profiler.stop_trace()
                self._profiling = False
                logging.info(f"profiler trace stopped @ step {self.steps}")
        batch = shard_batch(_step_batch(batch), self.mesh)
        # resume-stable stream: the step rng is a pure function of the step
        # index, so a --resume continuation consumes EXACTLY the rngs the
        # uninterrupted run would have (asserted across processes by
        # tests/test_multihost_training.py::test_two_process_ckpt_coordination)
        step_rng = jax.random.fold_in(jax.random.fold_in(self.rng, 0),
                                      self.steps)
        lr_g = jnp.float32(self.schedulers["generator"].lr)
        lr_d = jnp.float32(self.schedulers["discriminator"].lr)
        self.state, metrics = self.train_step(self.state, batch, step_rng,
                                              lr_g, lr_d)
        # accumulate on device; host sync happens only at log time
        for k, v in metrics.items():
            self.total_train_loss[k] = self.total_train_loss[k] + v
        self._train_count += 1

        # schedulers advance per-step, gated like the reference. Plateau
        # schedulers need the loss VALUE on host; float()-ing the fresh
        # device array would sync every step (~30 ms relay roundtrip vs
        # ~5 ms compute). Instead feed the PREVIOUS step's metric — its
        # computation has finished, so the readback is free; each loss is
        # consumed exactly once, one step later (immaterial for plateau
        # detection over thousands of steps).
        gen_start = self.config.get("generator_train_start_steps", 0)
        disc_start = self.config.get("discriminator_train_start_steps", 0)
        if self.steps > gen_start:
            if self._gen_sched_plateau:
                prev = self._pending_sched.pop("generator", None)
                if prev is not None:
                    self.schedulers["generator"].step(float(prev))
                self._pending_sched["generator"] = \
                    metrics["train/generator_loss"]
            else:
                self.schedulers["generator"].step(None)
        if self.steps > disc_start:
            if self._dis_sched_plateau:
                prev = self._pending_sched.pop("discriminator", None)
                if prev is not None:
                    self.schedulers["discriminator"].step(float(prev))
                self._pending_sched["discriminator"] = \
                    metrics["train/discriminator_loss"]
            else:
                self.schedulers["discriminator"].step(None)

        self.steps += 1
        if self._pbar is not None:
            self._pbar.update(1)
        self._check_train_finish()

    # ------------------------------------------------------------ intervals
    def _check_train_finish(self):
        if self.steps >= self.config["train_max_steps"]:
            self.finish_train = True

    def _check_log_interval(self):
        interval = self.config.get("log_interval_steps", 100)
        if self.steps % interval == 0 and self._train_count > 0:
            elapsed = time.time() - self._last_log_time
            for key, total in sorted(self.total_train_loss.items()):
                avg = float(total) / self._train_count
                logging.info(f"(Steps: {self.steps}) {key} = {avg:.4f}.")
                if self.writer:
                    self.writer.add_scalar(key, avg, self.steps)
            if self.writer:
                steps_per_sec = self._train_count / max(elapsed, 1e-9)
                self.writer.add_scalar("train/steps_per_sec", steps_per_sec,
                                       self.steps)
                # batch_size is per-process; scale to the global batch before
                # dividing by the global chip count
                samples_per_step = (self.config.get("batch_size", 1)
                                    * jax.process_count()
                                    * self.config.get("batch_max_steps", 0))
                if samples_per_step:
                    per_chip = (steps_per_sec * samples_per_step
                                / max(1, len(self.mesh.devices.flatten())))
                    self.writer.add_scalar("train/samples_per_sec_per_chip",
                                           per_chip, self.steps)
                self.writer.add_scalar("train/lr_generator",
                                       self.schedulers["generator"].lr, self.steps)
            self.total_train_loss = defaultdict(float)
            self._train_count = 0
            self._last_log_time = time.time()

    def _check_eval_interval(self):
        if self.steps % self.config.get("eval_interval_steps", 1000) == 0:
            self._eval_epoch()

    def _check_save_interval(self):
        if self.steps % self.config.get("save_interval_steps", 5000) == 0:
            path = os.path.join(self.outdir, f"checkpoint-{self.steps}steps.ckpt")
            self.save_checkpoint(path)
            logging.info(f"Successfully saved checkpoint @ {self.steps} steps.")

    # ----------------------------------------------------------------- eval
    def _eval_epoch(self):
        if self.is_host:
            logging.info(f"(Steps: {self.steps}) Start evaluation.")
        totals: dict = defaultdict(float)
        count = 0
        first_outputs = None
        first_batch = None
        for batch in self.data_loader.get("dev", []):
            sharded = shard_batch(_step_batch(batch), self.mesh)
            # (steps, eval-batch) keyed: deterministic under resume; the
            # fold_in(rng, 1) base keeps eval streams disjoint from train's
            # fold_in(rng, 0) family
            eval_rng = jax.random.fold_in(jax.random.fold_in(
                jax.random.fold_in(self.rng, 1), self.steps), count)
            metrics, y_ = self.eval_step(self.state, sharded, eval_rng)
            for k, v in metrics.items():
                totals[k] = totals[k] + v
            count += 1
            if first_outputs is None and self.is_host:
                if jax.process_count() > 1:
                    # batch-sharded output: only the local shards are
                    # addressable; they hold this host's own utterances
                    # (dedupe by index — replicated axes repeat shards)
                    # key by (start, stop) ints — slice objects are only
                    # hashable on Python 3.12+
                    uniq = {tuple((sl.start, sl.stop) for sl in s.index):
                            s.data for s in y_.addressable_shards}
                    order = sorted(uniq, key=lambda idx: [st or 0
                                                          for st, _ in idx])
                    first_outputs = np.concatenate(
                        [np.asarray(uniq[k]) for k in order])
                else:
                    first_outputs = np.asarray(y_)
                first_batch = batch
        if count == 0:
            return
        if self.is_host:
            logging.info(f"(Steps: {self.steps}) Finished evaluation "
                         f"({count} steps per epoch).")
        # jitted metrics are replicated scalars — identical on every process,
        # so the best-mel decision stays in sync across hosts
        averages = {k: float(v) / count for k, v in totals.items()}
        if self.is_host:
            for key, avg in sorted(averages.items()):
                logging.info(f"(Steps: {self.steps}) {key} = {avg:.4f}.")
                if self.writer:
                    self.writer.add_scalar(key, avg, self.steps)
        mel_key = "eval/mel_loss"
        if mel_key in averages and averages[mel_key] < self.best_mel_loss:
            self.best_mel_loss = averages[mel_key]
            self.save_checkpoint(os.path.join(self.outdir, "best_mel_ckpt.pkl"))
            if self.is_host:
                with open(os.path.join(self.outdir, "best_mel_step.txt"), "w") as f:
                    f.write(f"{self.steps} {self.best_mel_loss}")
                logging.info(f"(Steps: {self.steps}) New best eval/mel_loss "
                             f"{self.best_mel_loss:.4f}.")
        if first_outputs is not None and self.is_host:
            self._save_intermediate(first_batch, first_outputs)

    def _save_intermediate(self, batch, y_gen: np.ndarray):
        """Save ref/gen comparison plots (+wavs for waveform targets)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        y_ref = np.asarray(batch["y"])
        # y_gen may carry shard padding rows (multi-host tail batches);
        # only the first len(y_ref) rows correspond to real local utterances
        n = min(self.config.get("num_save_intermediate_results", 4),
                len(y_gen), len(y_ref))
        dirname = os.path.join(self.outdir, f"predictions/{self.steps}steps")
        os.makedirs(dirname, exist_ok=True)
        sr = self.config.get("sampling_rate", 16000)
        is_wave = y_ref.ndim == 3 and y_ref.shape[-1] == 1
        for idx in range(n):
            r = y_ref[idx].squeeze()
            g = y_gen[idx].squeeze()
            fig, axes = plt.subplots(2, 1, figsize=(6, 4))
            axes[0].plot(r)
            axes[0].set_title("groundtruth")
            axes[1].plot(g)
            axes[1].set_title(f"generated @ {self.steps} steps")
            fig.tight_layout()
            fig.savefig(os.path.join(dirname, f"{idx}.png"))
            plt.close(fig)
            if is_wave:
                write_wav(os.path.join(dirname, f"{idx}_ref.wav"), r, sr)
                write_wav(os.path.join(dirname, f"{idx}_gen.wav"), g, sr)

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self, path: str):
        backend = self.config.get("checkpoint_backend", "msgpack")
        if backend == "orbax":
            # orbax writes per-host shards itself; every process participates
            from articulatory_tpu.utils.checkpoint import save_checkpoint_orbax

            save_checkpoint_orbax(path, self.state, schedulers=self.schedulers,
                                  epochs=self.epochs)
        elif self.is_host:
            save_checkpoint(path, jax.device_get(self.state),
                            schedulers=self.schedulers, epochs=self.epochs)
