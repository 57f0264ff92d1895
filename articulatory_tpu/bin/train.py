#!/usr/bin/env python3
"""Train GAN-based articulatory synthesis/inversion models on TPU.

Parity target: reference articulatory/bin/train.py:1323-1851 (same CLI
flags, same dataset/collater selection by ``dataset_mode``, same config
merge + dump contract). TPU replacements: the NCCL env:// launcher becomes
``jax.distributed.initialize``; DistributedSampler becomes per-host index
sharding in the DataLoader; gradient sync is emitted by XLA from the mesh
sharding (see articulatory_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from articulatory_tpu.bin.preprocess import set_logging
from articulatory_tpu.config import dump_config
from articulatory_tpu.data import (
    CollaterMelArt,
    DataLoader,
    MelArtDataset,
    SizeAwareSampler,
    SpeechCollater,
    SpeechDataset,
)
from articulatory_tpu.data.transforms import ART_ONLY_TRANSFORMS, get_transform
from articulatory_tpu.models import build_model
from articulatory_tpu.parallel.mesh import make_data_mesh, replicate
from articulatory_tpu.train.gan import (
    GANCriterion,
    GANTrainState,
    make_eval_step,
    make_forward,
    make_train_step,
)
from articulatory_tpu.train.optimizers import build_optimizer
from articulatory_tpu.train.schedulers import build_scheduler
from articulatory_tpu.train.trainer import Trainer
from articulatory_tpu.utils.checkpoint import load_checkpoint, restore_state
from articulatory_tpu.utils.io import read_hdf5


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train articulatory model (TPU-native).")
    parser.add_argument("--train-wav-scp", default=None, type=str)
    parser.add_argument("--train-feats-scp", default=None, type=str)
    parser.add_argument("--train-segments", default=None, type=str)
    parser.add_argument("--train-dumpdir", default=None, type=str)
    parser.add_argument("--train-dumpdirs", default=None, type=str)
    parser.add_argument("--dev-wav-scp", default=None, type=str)
    parser.add_argument("--dev-feats-scp", default=None, type=str)
    parser.add_argument("--dev-segments", default=None, type=str)
    parser.add_argument("--dev-dumpdir", default=None, type=str)
    parser.add_argument("--dev-dumpdirs", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--pretrain", default="", type=str, nargs="?")
    parser.add_argument("--pretrain2", default="", type=str, nargs="?")
    parser.add_argument("--resume", default="", type=str, nargs="?")
    parser.add_argument("--verbose", type=int, default=1)
    parser.add_argument("--rank", "--local_rank", default=0, type=int)
    # TPU-specific (replaces the env-var launcher)
    parser.add_argument("--coordinator-address", default=None, type=str)
    parser.add_argument("--num-processes", default=None, type=int)
    parser.add_argument("--process-id", default=None, type=int)
    parser.add_argument("--data-root", default="data", type=str,
                        help="root holding <stage>/feats.scp maps")
    parser.add_argument("--seed", default=0, type=int)
    return parser


def build_datasets(args, config):
    """Dataset + collater selection (reference train.py:1510-1602)."""
    if config.get("remove_short_samples", False):
        mel_length_threshold = (config["batch_max_steps"] // config["hop_size"]
                                + 2 * config["generator_params"].get(
                                    "aux_context_window", 0))
    else:
        mel_length_threshold = None
    if config["format"] == "hdf5":
        audio_query, mel_query = "*.h5", "*.h5"
        audio_load_fn = lambda x: read_hdf5(x, "wave")  # noqa: E731
        mel_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
    elif config["format"] == "npy":
        audio_query, mel_query = "*-wave.npy", "*-feats.npy"
        audio_load_fn = np.load
        mel_load_fn = np.load
    else:
        raise ValueError("support only hdf5 or npy format.")

    dataset_mode = config.get("dataset_mode", "default")
    transform_spec = config.get("transform")
    transform = get_transform(transform_spec)
    input_transform = config.get("input_transform")
    input_transform = (get_transform(input_transform)
                       if input_transform is not None else transform)
    output_transform = config.get("output_transform")
    if output_transform is not None:
        output_transform = get_transform(output_transform)
    elif transform_spec not in ART_ONLY_TRANSFORMS:
        # reference train.py:1539 defaults output_transform to ``transform``
        # — but art-only transforms (e.g. "10*f0") must not be applied to
        # SpeechDataset's 1-D audio output (see data/transforms.py).
        output_transform = transform

    rng = np.random.default_rng(config.get("seed", 0))
    if dataset_mode in ("art", "a2m", "m2a"):
        assert args.train_dumpdir is not None and args.dev_dumpdir is not None
        mk = lambda d: MelArtDataset(  # noqa: E731
            root_dir=d, mel_query=mel_query, mel_load_fn=mel_load_fn,
            mel_length_threshold=mel_length_threshold,
            allow_cache=config.get("allow_cache", False), transform=transform,
            data_root=args.data_root)
        train_dataset, dev_dataset = mk(args.train_dumpdir), mk(args.dev_dumpdir)
        gp = config["generator_params"]
        ar_len = (int(gp["ar_input"] / gp["out_channels"])
                  if gp.get("use_ar", False) else None)
        collater = CollaterMelArt(
            batch_max_steps=config["batch_max_steps"],
            hop_size=config["hop_size"],
            aux_context_window=gp.get("aux_context_window", 0),
            ar_len=ar_len, dataset_mode=dataset_mode, rng=rng)
        return train_dataset, dev_dataset, collater, collater
    else:
        assert args.train_dumpdir is not None and args.dev_dumpdir is not None
        gp = config["generator_params"]
        use_spk_id = gp.get("use_spk_id", False)
        use_ph = (gp.get("use_ph", False) or gp.get("use_ph_loss", False)
                  or dataset_mode in ("ph2a", "ph2m"))
        train_dataset = SpeechDataset(
            root_dir=args.train_dumpdir, audio_query=audio_query,
            audio_load_fn=audio_load_fn, mel_query=mel_query,
            mel_load_fn=mel_load_fn,
            allow_cache=config.get("allow_cache", False), transform=transform,
            input_transform=input_transform, output_transform=output_transform,
            use_spk_id=use_spk_id, use_ph=use_ph, dataset_mode=dataset_mode,
            data_root=args.data_root)
        if use_spk_id:
            assert len(train_dataset.spks) == gp["num_spk"]
        dev_dataset = SpeechDataset(
            root_dir=args.dev_dumpdir, audio_query=audio_query,
            audio_load_fn=audio_load_fn, mel_query=mel_query,
            mel_load_fn=mel_load_fn,
            allow_cache=config.get("allow_cache", False), transform=transform,
            input_transform=input_transform, output_transform=output_transform,
            use_spk_id=use_spk_id, use_ph=use_ph, spks=train_dataset.spks,
            dataset_mode=dataset_mode, data_root=args.data_root)
        mk_collater = lambda: SpeechCollater(  # noqa: E731
            batch_max_steps=config["batch_max_steps"],
            hop_size=config["hop_size"],
            aux_context_window=gp.get("aux_context_window", 0),
            use_noise_input=config.get(
                "generator_type",
                "ParallelWaveGANGenerator") in ["ParallelWaveGANGenerator"],
            dataset_mode=dataset_mode, use_spk_id=use_spk_id, use_ph=use_ph,
            config=config, rng=rng)
        return train_dataset, dev_dataset, mk_collater(), mk_collater()


def _cpu_init_context():
    """Initialize params on the CPU backend when the default is a TPU.

    Remote-TPU compilation of the init graphs costs minutes per run and is
    pure waste — init math is tiny. Requires 'cpu' in jax_platforms (main()
    appends it); params land on CPU and are placed by replicate() later.
    """
    import contextlib

    try:
        if jax.default_backend() != "cpu":
            return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        pass
    return contextlib.nullcontext()


def init_models(config, batch, seed=0):
    """Build + init generator(s)/discriminator from one example batch."""
    from articulatory_tpu.config import inject_time_packing

    gen = build_model(config["generator_type"],
                      inject_time_packing(config["generator_type"],
                                          config["generator_params"], config))
    disc = build_model(config["discriminator_type"],
                       config.get("discriminator_params", {}))
    gen2 = None
    if "generator2_type" in config:
        gen2 = build_model(config["generator2_type"],
                           inject_time_packing(config["generator2_type"],
                                               config["generator2_params"],
                                               config))

    key = jax.random.PRNGKey(seed)
    k_g, k_g2, k_d, k_n, k_w = jax.random.split(key, 5)
    rngs_g = {"params": k_g, "noise": k_n, "dropout": k_n}
    fwd = make_forward(gen)

    x = tuple(jnp.asarray(v) for v in batch["x"])
    ar_key = "ar" if gen2 is None else "ar"
    ar = jnp.asarray(batch["ar"]) if batch.get("ar") is not None and "ar" in batch else None
    spk_id = jnp.asarray(batch["spk_id"]) if "spk_id" in batch else None
    ph = jnp.asarray(batch["ph"]) if "ph" in batch else None

    import inspect as _inspect

    def init_model(model, args_tuple, **kwargs):
        sig = _inspect.signature(type(model).__call__)
        kw = {k: v for k, v in kwargs.items()
              if k in sig.parameters and v is not None}
        return model.init(rngs_g, *args_tuple, **kw)

    with _cpu_init_context():
        vg = init_model(gen, x, spk_id=spk_id, ar=ar, ph=ph)
        params_g = vg["params"]
        mutables_g = {k: v for k, v in vg.items() if k != "params"}

        params_g2 = None
        if gen2 is not None:
            y0 = fwd(vg, x, spk_id=spk_id, ar=ar, ph=ph,
                     rngs={"noise": k_n, "dropout": k_n})
            if isinstance(y0, tuple):
                y0 = y0[0]
            ar2 = jnp.asarray(batch["ar2"]) if "ar2" in batch else None
            vg2 = init_model(gen2, (y0,), spk_id=spk_id, ar=ar2, ph=ph)
            params_g2 = vg2["params"]

        # discriminator init input mirrors the train-time concat
        y = jnp.asarray(batch["y"])
        if config["generator_params"].get("use_ar", False):
            past = batch.get("ar2", batch.get("ar"))
            disc_in = jnp.concatenate([jnp.asarray(past), y], axis=1)
        else:
            disc_in = y
        vd = disc.init({"params": k_d, "window": k_w}, disc_in)
    return gen, gen2, disc, params_g, params_g2, mutables_g, vd["params"]


def main():
    args = build_parser().parse_args()
    set_logging(args.verbose)

    # Honor the JAX_PLATFORMS env var even after a sitecustomize imported
    # jax (utils/platform.py; also used by bin/decode.py, model_stats.py)
    from articulatory_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    is_distributed = (args.coordinator_address is not None
                      or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if is_distributed:
        pid = args.process_id
        if pid is None and "JAX_PROCESS_ID" in os.environ:
            pid = int(os.environ["JAX_PROCESS_ID"])
        coord = args.coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = args.num_processes
        if nproc is None and "JAX_NUM_PROCESSES" in os.environ:
            nproc = int(os.environ["JAX_NUM_PROCESSES"])
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
        if jax.process_index() != 0 and args.verbose <= 1:
            # non-rank-0 stdout squelch, matching the reference
            # (train.py:1461-1463)
            logging.getLogger().setLevel(logging.WARNING)
        # cache policy AFTER distributed init: enable_compilation_cache now
        # probes the default backend for its platform fingerprint, and
        # backends must not initialize before jax.distributed.initialize
        enable_compilation_cache(process_id=pid)
    else:
        enable_compilation_cache()

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))
    config["version"] = "0.1.0-tpu"

    if jax.process_index() == 0:
        dump_config({k: v for k, v in config.items()}, args.outdir)
        logging.info(f"config dumped to {os.path.join(args.outdir, 'config.yml')}")

    train_dataset, dev_dataset, train_collater, dev_collater = \
        build_datasets(args, config)
    logging.info(f"The number of training files = {len(train_dataset)}.")
    logging.info(f"The number of development files = {len(dev_dataset)}.")

    num_shards = jax.process_count()
    shard_id = jax.process_index()

    batch_sampler = None
    if config.get("batch_sampler_type", "None") != "None":
        lens_path = os.path.join(args.train_dumpdir, "train_audio_lens.npy")
        audio_lens = None
        if os.path.exists(lens_path):
            audio_lens = np.load(lens_path)
            if len(audio_lens) != len(train_dataset):
                # stale cache (dataset composition changed, e.g.
                # remove_short_samples toggled) — recompute
                audio_lens = None
        if audio_lens is None:
            audio_lens = np.array([len(train_dataset[i]["audio"])
                                   for i in range(len(train_dataset))])
            if shard_id == 0:  # atomic write; other ranks computed their own
                tmp = lens_path + f".tmp{os.getpid()}.npy"
                np.save(tmp, audio_lens)
                os.replace(tmp, lens_path)
        assert config["batch_sampler_type"] == "SizeAwareSampler"
        sampler_params = dict(config.get("batch_sampler_params", {}))
        # all hosts must draw identical batch packings (the loader shards
        # the batch list); seed deterministically unless the config says so
        sampler_params.setdefault("seed", args.seed)
        batch_sampler = SizeAwareSampler(audio_lens, **sampler_params)

    # opt-in device-resident corpus cache: batches are assembled ON device
    # by a jitted crop; the host ships only (utt, start) indices per step.
    # Eliminates per-step host transfers (which leak on the axon relay —
    # see data/device_cache.py) and host-input latency entirely.
    train_loader = None
    cache_mode = None
    if config.get("use_device_cache", False):
        from articulatory_tpu.data.device_cache import canonical_cache_mode

        # generic x2y modes (e.g. the shipped mri string) resolve onto the
        # art/audio streams and ride the cache through the canonical mode
        cache_mode = canonical_cache_mode(
            config.get("dataset_mode") or "default")
    if (cache_mode is not None
            and config.get("package_mode", "random_window") == "random_window"
            and batch_sampler is None and num_shards == 1
            # the streams below are host-collater-only: aux_context_window
            # frames, generator2 'ar2' windows, spk/ph ids, PCD pitch tracks
            and config["generator_params"].get("aux_context_window", 0) == 0
            and config.get("generator2_type") is None
            and not config["generator_params"].get("use_spk_id", False)
            and not config["generator_params"].get("use_ph", False)
            and not config.get("use_pcd", False)):
        from articulatory_tpu.data.device_cache import DeviceCachedBatcher

        cache_config = config if cache_mode == config.get("dataset_mode") \
            else {**config, "dataset_mode": cache_mode}
        train_loader = DeviceCachedBatcher(
            train_dataset, cache_config, batch_size=config["batch_size"],
            seed=args.seed)
        logging.info("using device-resident corpus cache for training data")
    elif config.get("use_device_cache", False):
        logging.warning("use_device_cache set but unsupported for this "
                        "configuration; falling back to the host loader")

    # opt-in native C++ batch assembly for the hot a2w/random_window path
    if (train_loader is None and config.get("use_native_loader", False)
            and config.get("dataset_mode") == "a2w"
            and config.get("package_mode", "random_window") == "random_window"
            and batch_sampler is None):
        from articulatory_tpu.data import native_loader as nl

        if nl.is_available():
            gp = config["generator_params"]
            ar_len = (int(gp.get("ar_input", 512) / gp.get("out_channels", 1))
                      if gp.get("use_ar", False) else 0)
            train_loader = nl.NativeDataLoader(
                train_dataset, batch_size=config["batch_size"],
                batch_max_steps=config["batch_max_steps"],
                hop_size=config["hop_size"], ar_len=ar_len, seed=args.seed,
                shard_id=shard_id, num_shards=num_shards,
                n_threads=max(2, config.get("num_workers", 0) or 4))
            logging.info("using native C++ batch assembly for training data")
        else:
            logging.warning("use_native_loader set but the native library is "
                            "not built; falling back to the Python loader")

    data_loader = {
        "train": train_loader if train_loader is not None else
        DataLoader(train_dataset, batch_size=config["batch_size"],
                            shuffle=True, collate_fn=train_collater,
                            drop_last=True, batch_sampler=batch_sampler,
                            num_workers=config.get("num_workers", 0),
                            seed=args.seed, shard_id=shard_id,
                            num_shards=num_shards),
        "dev": DataLoader(dev_dataset,
                          batch_size=min(config["batch_size"],
                                         max(1, len(dev_dataset) // num_shards)),
                          shuffle=True, collate_fn=dev_collater,
                          drop_last=True,
                          num_workers=config.get("num_workers", 0),
                          seed=args.seed, shard_id=shard_id,
                          num_shards=num_shards),
    }

    # peek one batch for shape-driven init
    example_batch = next(iter(DataLoader(
        train_dataset, batch_size=min(config["batch_size"], 2), shuffle=False,
        collate_fn=train_collater, drop_last=False)))

    gen, gen2, disc, params_g, params_g2, mutables_g, params_d = \
        init_models(config, example_batch, seed=args.seed)
    logging.info(f"generator params: {count_params(params_g):,}")
    logging.info(f"discriminator params: {count_params(params_d):,}")

    tx_g = build_optimizer(config.get("generator_optimizer_type", "RAdam"),
                           config.get("generator_optimizer_params", {}),
                           config.get("generator_grad_norm", -1))
    tx_d = build_optimizer(config.get("discriminator_optimizer_type", "RAdam"),
                           config.get("discriminator_optimizer_params", {}),
                           config.get("discriminator_grad_norm", -1))
    schedulers = {
        "generator": build_scheduler(
            config.get("generator_scheduler_type", "StepLR"),
            config.get("generator_optimizer_params", {}).get("lr", 1e-3),
            config.get("generator_scheduler_params", {})),
        "discriminator": build_scheduler(
            config.get("discriminator_scheduler_type", "StepLR"),
            config.get("discriminator_optimizer_params", {}).get("lr", 1e-3),
            config.get("discriminator_scheduler_params", {})),
    }

    state = GANTrainState(
        params_g=params_g, params_d=params_d,
        opt_g=tx_g.init(params_g), opt_d=tx_d.init(params_d),
        steps=jnp.asarray(0, jnp.int32), params_g2=params_g2,
        mutables_g=mutables_g)

    epochs = 0
    if args.pretrain:
        payload = load_checkpoint(args.pretrain)
        state, _ = restore_state(state, payload, load_only_params=True)
        logging.info(f"Successfully loaded parameters from {args.pretrain}.")
    if args.pretrain2 and gen2 is not None:
        payload = load_checkpoint(args.pretrain2)
        # stage-2 generator + discriminator come from the second checkpoint
        # (reference train.py:178-214)
        import flax.serialization as fser

        state = state.replace(
            params_g2=fser.from_state_dict(state.params_g2,
                                           payload["model"]["generator"]),
            params_d=fser.from_state_dict(state.params_d,
                                          payload["model"]["discriminator"]))
        logging.info(f"Successfully loaded stage-2 from {args.pretrain2}.")
    if args.resume:
        payload = load_checkpoint(args.resume)
        state, epochs = restore_state(state, payload, schedulers=schedulers)
        logging.info(f"Successfully resumed from {args.resume}.")

    criterion = GANCriterion(config)
    tp = int(config.get("tensor_parallel", 1))
    if tp > 1:
        # 2-D (data, model) mesh: generator channel-sharded, discriminator
        # replicated (see parallel/tp.py for scope + rationale)
        from articulatory_tpu.parallel.tp import make_dp_tp_mesh, shard_tree_tp

        n = len(jax.devices())
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tensor_parallel={tp}")
        dp = n // tp
        while dp > 1 and config["batch_size"] % dp != 0:
            dp -= 1
        mesh = make_dp_tp_mesh(tp=tp, num_devices=dp * tp)
        state = replicate(state, mesh)
        state = state.replace(params_g=shard_tree_tp(state.params_g, mesh),
                              opt_g=shard_tree_tp(state.opt_g, mesh))
    else:
        mesh = make_data_mesh(config["batch_size"])
        state = replicate(state, mesh)
    train_step = jax.jit(make_train_step(gen, disc, criterion, config,
                                         tx_g, tx_d, gen2=gen2),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(gen, disc, criterion, config, gen2=gen2))

    trainer = Trainer(config=config, state=state, train_step=train_step,
                      eval_step=eval_step, schedulers=schedulers,
                      data_loader=data_loader, outdir=args.outdir, mesh=mesh,
                      steps=int(np.asarray(jax.device_get(state.steps))),
                      epochs=epochs, seed=args.seed)
    try:
        trainer.run()
    except KeyboardInterrupt:
        trainer.save_checkpoint(
            os.path.join(args.outdir, f"checkpoint-{trainer.steps}steps.ckpt"))
        logging.info(f"Successfully saved checkpoint @ {trainer.steps}steps.")


if __name__ == "__main__":
    main()
