"""Multi-host GAN training: 2 processes, replicated state, per-host local
batches assembled into global arrays, gradient sync by XLA."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from articulatory_tpu.models import (
        HiFiGANGenerator, HiFiGANMultiScaleMultiPeriodDiscriminator)
    from articulatory_tpu.train.gan import (
        GANCriterion, GANTrainState, make_train_step)
    from articulatory_tpu.train.optimizers import build_optimizer
    from articulatory_tpu.parallel.mesh import make_data_mesh, replicate, shard_batch

    pid = jax.process_index()
    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
    }
    gen = HiFiGANGenerator(in_channels=13, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    rng = np.random.default_rng(0)  # same init rng on every process
    key = jax.random.PRNGKey(0)
    c0 = jnp.zeros((1, 10, 13))
    import contextlib
    vg = gen.init(key, c0)
    vd = disc.init({"params": key, "window": key}, jnp.zeros((1, 800, 1)))
    tx = build_optimizer("SGD", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))

    # local per-host batch: 8 utterances each -> global batch 16 over the mesh
    local_rng = np.random.default_rng(100 + pid)
    batch = {"x": (local_rng.standard_normal((8, 10, 13)).astype(np.float32),),
             "y": (local_rng.standard_normal((8, 800, 1)) * 0.1).astype(np.float32)}

    mesh = make_data_mesh(16)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(gen, disc, GANCriterion(config), config,
                                   tx, tx))
    lr = jnp.float32(1e-3)
    for i in range(2):
        state, m = step(state, sharded, jax.random.PRNGKey(5 + i), lr, lr)
    loss = float(m["train/generator_loss"])
    assert np.isfinite(loss)
    # params identical across processes after synced updates: compare a
    # host-side checksum of the local replica across hosts
    from jax.experimental import multihost_utils

    leaf = jax.tree.leaves(state.params_g)[0]
    chk = np.float64(np.sum(np.asarray(leaf.addressable_data(0))))
    all_chk = multihost_utils.process_allgather(chk)
    assert np.allclose(all_chk, all_chk[0]), f"params diverged: {all_chk}"
    print(f"proc {pid} OK loss {loss:.3f}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    root = os.path.join(os.path.dirname(__file__), "..")
    env = os.environ.copy()
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # keep per-process device counts even so the 16-way global batch shards
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    proc = subprocess.run(
        [sys.executable, "-m", "articulatory_tpu.distributed.launch",
         "--nproc_per_node", "2", "--master_port", "29741", str(worker)],
        env=env, capture_output=True, text=True, timeout=480)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("OK") == 2, proc.stdout + proc.stderr


TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    import numpy as np
    import jax.numpy as jnp

    from articulatory_tpu.models import (
        HiFiGANGenerator, HiFiGANMultiScaleMultiPeriodDiscriminator)
    from articulatory_tpu.train.gan import (
        GANCriterion, GANTrainState, make_train_step, make_eval_step)
    from articulatory_tpu.train.optimizers import build_optimizer
    from articulatory_tpu.train.schedulers import ConstantLR
    from articulatory_tpu.train.trainer import Trainer
    from articulatory_tpu.parallel.mesh import make_data_mesh, replicate

    pid = jax.process_index()
    outdir = sys.argv[1]
    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
        # intervals chosen so 4 steps hit eval twice and save twice
        "train_max_steps": 4, "eval_interval_steps": 2,
        "save_interval_steps": 2, "log_interval_steps": 2,
        "num_save_intermediate_results": 1, "batch_size": 16,
    }
    gen = HiFiGANGenerator(in_channels=13, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, jnp.zeros((1, 10, 13)))
    vd = disc.init({"params": key, "window": key}, jnp.zeros((1, 800, 1)))
    tx = build_optimizer("SGD", {})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(1, jnp.int32))
    mesh = make_data_mesh(16)
    state = replicate(state, mesh)

    local_rng = np.random.default_rng(100 + pid)
    def batches(n):
        out = []
        for _ in range(n):
            out.append({
                "x": (local_rng.standard_normal((8, 10, 13)).astype(np.float32),),
                "y": (local_rng.standard_normal((8, 800, 1)) * 0.1).astype(np.float32)})
        return out

    criterion = GANCriterion(config)
    trainer = Trainer(
        config=config, state=state,
        train_step=jax.jit(make_train_step(gen, disc, criterion, config, tx, tx)),
        eval_step=jax.jit(make_eval_step(gen, disc, criterion, config)),
        schedulers={"generator": ConstantLR(1e-3, factor=1.0),
                    "discriminator": ConstantLR(1e-3, factor=1.0)},
        data_loader={"train": batches(8), "dev": batches(2)},
        outdir=outdir, mesh=mesh, steps=0, writer=False or None)
    trainer.run()

    from jax.experimental import multihost_utils
    leaf = jax.tree.leaves(trainer.state.params_g)[0]
    chk = np.float64(np.sum(np.asarray(leaf.addressable_data(0))))
    all_chk = multihost_utils.process_allgather(chk)
    assert np.allclose(all_chk, all_chk[0]), f"params diverged: {all_chk}"
    print(f"proc {pid} TRAINER-OK steps {trainer.steps}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_trainer_intervals(tmp_path):
    """The Trainer's eval/save interval paths must run on BOTH processes
    (SPMD collectives) without deadlock, and emit artifacts exactly once."""
    worker = tmp_path / "worker.py"
    worker.write_text(TRAINER_WORKER)
    outdir = tmp_path / "exp"
    outdir.mkdir()
    root = os.path.join(os.path.dirname(__file__), "..")
    env = os.environ.copy()
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    proc = subprocess.run(
        [sys.executable, "-m", "articulatory_tpu.distributed.launch",
         "--nproc_per_node", "2", "--master_port", "29743",
         str(worker), str(outdir)],
        env=env, capture_output=True, text=True, timeout=480)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("TRAINER-OK") == 2, proc.stdout + proc.stderr
    assert (outdir / "best_mel_ckpt.pkl").exists()
    assert (outdir / "checkpoint-4steps.ckpt").exists()
    assert (outdir / "best_mel_step.txt").exists()


CKPT_WORKER = textwrap.dedent("""
    import os, sys, hashlib
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    import numpy as np
    import jax.numpy as jnp

    from articulatory_tpu.models import (
        HiFiGANGenerator, HiFiGANMultiScaleMultiPeriodDiscriminator)
    from articulatory_tpu.train.gan import (
        GANCriterion, GANTrainState, make_train_step, make_eval_step)
    from articulatory_tpu.train.optimizers import build_optimizer
    from articulatory_tpu.train.schedulers import build_scheduler
    from articulatory_tpu.train.trainer import Trainer
    from articulatory_tpu.utils.checkpoint import (
        load_checkpoint, restore_state)
    from articulatory_tpu.parallel.mesh import make_data_mesh, replicate

    pid = jax.process_index()
    outdir, mode = sys.argv[1], sys.argv[2]   # mode: full | part1 | part2
    config = {
        "dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
        "use_stft_loss": False, "use_mel_loss": True,
        "mel_loss_params": {"fs": 16000, "fft_size": 256, "hop_size": 80,
                            "num_mels": 20, "fmin": 0, "fmax": 8000},
        "use_feat_match_loss": False,
        "generator_adv_loss_params": {"average_by_discriminators": False},
        "discriminator_adv_loss_params": {"average_by_discriminators": False},
        "lambda_aux": 45.0, "lambda_adv": 1.0,
        "generator_train_start_steps": 0, "discriminator_train_start_steps": 0,
        "generator_params": {"out_channels": 1, "use_ar": False},
        "train_max_steps": 6, "eval_interval_steps": 3,
        "save_interval_steps": 3, "log_interval_steps": 3,
        "num_save_intermediate_results": 0, "batch_size": 16,
    }
    gen = HiFiGANGenerator(in_channels=13, channels=16,
                           upsample_scales=(5, 4, 2, 2),
                           upsample_kernel_sizes=(10, 8, 4, 4),
                           resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    disc = HiFiGANMultiScaleMultiPeriodDiscriminator(
        scales=1, scale_discriminator_params={"channels": 8,
                                              "max_downsample_channels": 16,
                                              "max_groups": 2},
        periods=[2], period_discriminator_params={"channels": 2,
                                                  "max_downsample_channels": 4})
    key = jax.random.PRNGKey(0)
    vg = gen.init(key, jnp.zeros((1, 10, 13)))
    vd = disc.init({"params": key, "window": key}, jnp.zeros((1, 800, 1)))
    tx = build_optimizer("Adam", {"betas": [0.5, 0.9]})
    state = GANTrainState(params_g=vg["params"], params_d=vd["params"],
                          opt_g=tx.init(vg["params"]),
                          opt_d=tx.init(vd["params"]),
                          steps=jnp.asarray(0, jnp.int32))
    # milestone INSIDE the post-resume window: LR continuation must come
    # from the restored scheduler state, not a fresh one
    scheds = {"generator": build_scheduler("MultiStepLR", 1e-3,
                                           {"milestones": [5], "gamma": 0.5}),
              "discriminator": build_scheduler("MultiStepLR", 1e-3,
                                               {"milestones": [5], "gamma": 0.5})}
    steps = 0
    if mode == "part1":
        config["train_max_steps"] = 4   # dies at 4; last durable save at 3
    elif mode == "part2":
        payload = load_checkpoint(os.path.join(outdir, "checkpoint-3steps.ckpt"))
        state, _epochs = restore_state(state, payload, schedulers=scheds)
        steps = int(payload["steps"])
        assert steps == 3, steps

    # per-(host, global-step) deterministic batches: a resume regenerates
    # EXACTLY the batches the uninterrupted run consumed at those steps
    def batch_for(s):
        r = np.random.default_rng(7000 + 97 * s + pid)
        return {"x": (r.standard_normal((8, 10, 13)).astype(np.float32),),
                "y": (r.standard_normal((8, 800, 1)) * 0.1).astype(np.float32)}

    train_batches = [batch_for(s) for s in range(steps,
                                                 config["train_max_steps"])]
    dev_batches = [batch_for(1000)]

    mesh = make_data_mesh(16)
    state = replicate(state, mesh)
    criterion = GANCriterion(config)
    trainer = Trainer(
        config=config, state=state,
        train_step=jax.jit(make_train_step(gen, disc, criterion, config,
                                           tx, tx)),
        eval_step=jax.jit(make_eval_step(gen, disc, criterion, config)),
        schedulers=scheds,
        data_loader={"train": train_batches, "dev": dev_batches},
        outdir=outdir, mesh=mesh, steps=steps, writer=None)
    trainer.run()

    h = hashlib.md5()
    for leaf in (jax.tree.leaves(trainer.state.params_g)
                 + jax.tree.leaves(trainer.state.params_d)):
        h.update(np.asarray(leaf.addressable_data(0)).tobytes())
    digest = h.hexdigest()
    from jax.experimental import multihost_utils
    byte_vec = np.frombuffer(bytes.fromhex(digest), np.uint8)
    all_d = multihost_utils.process_allgather(byte_vec)
    assert (all_d == all_d[0]).all(), "replicas diverged across processes"
    print(f"proc {pid} CKPT-{mode}-OK md5 {digest} steps {trainer.steps} "
          f"lr {scheds['generator'].lr:.6f}", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_ckpt_coordination(tmp_path):
    """Cross-host checkpoint coordination (SURVEY §5, VERDICT r4 #6): a
    2-process run saves at step 3, dies at 4; both ranks relaunch and
    resume from the durable save; the continuation is BIT-IDENTICAL to an
    uninterrupted 2-process run (params md5, scheduler LR across a
    post-resume milestone, resume-stable per-step rngs)."""
    root = os.path.join(os.path.dirname(__file__), "..")
    env = os.environ.copy()
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = tmp_path / "worker.py"
    worker.write_text(CKPT_WORKER)

    def launch(outdir, mode, port):
        proc = subprocess.run(
            [sys.executable, "-m", "articulatory_tpu.distributed.launch",
             "--nproc_per_node", "2", "--master_port", str(port),
             str(worker), str(outdir), mode],
            env=env, capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        lines = [ln for ln in proc.stdout.splitlines()
                 if f"CKPT-{mode}-OK" in ln]
        assert len(lines) == 2, proc.stdout + proc.stderr
        return lines[0].split("md5 ")[1]

    interrupted = tmp_path / "exp_interrupted"
    uninterrupted = tmp_path / "exp_full"
    interrupted.mkdir(), uninterrupted.mkdir()
    launch(interrupted, "part1", 29745)
    assert (interrupted / "checkpoint-3steps.ckpt").exists()
    resumed_tail = launch(interrupted, "part2", 29746)
    full_tail = launch(uninterrupted, "full", 29747)
    assert resumed_tail == full_tail, (resumed_tail, full_tail)
