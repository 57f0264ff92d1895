"""Sequence parallelism: time-sharded generator forward/grad equals the
unsharded computation (GSPMD halo exchange between time shards)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.parallel.sp import jit_time_sharded, shard_time
from articulatory_tpu.parallel.tp import make_dp_tp_mesh


def test_time_sharded_forward_and_grad(rng):
    assert len(jax.devices()) >= 8
    gen = HiFiGANGenerator(
        in_channels=13, channels=16, upsample_scales=(5, 4),
        upsample_kernel_sizes=(10, 8), resblock_kernel_sizes=(3, 7),
        resblock_dilations=((1, 3), (1, 3)))
    c = jnp.asarray(rng.standard_normal((2, 64, 13)), jnp.float32)
    v = gen.init(jax.random.PRNGKey(0), c)
    y0 = np.asarray(gen.apply(v, c))

    mesh = make_dp_tp_mesh(tp=4, num_devices=8)  # (data=2, model=4)
    params = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), v["params"])
    cb = shard_time(c, mesh)
    assert "model" in str(cb.sharding.spec)

    f = jit_time_sharded(lambda p, c: gen.apply({"params": p}, c), mesh)
    y = f(params, cb)
    assert "model" in str(y.sharding.spec)  # output stays time-sharded
    np.testing.assert_allclose(np.asarray(y), y0, rtol=1e-5, atol=1e-6)

    def loss(p, c):
        return jnp.mean(gen.apply({"params": p}, c) ** 2)

    g0 = jax.device_get(jax.jit(jax.grad(loss))(v["params"], c))
    g1 = jax.device_get(jax.jit(jax.grad(loss))(params, cb))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_sp_pads_non_divisible_lengths(rng):
    """enable_sequence_parallel on an utterance whose frame count is NOT a
    multiple of the device count: LoadedModel pads T up and trims the
    output (device_put with a time sharding needs even divisibility —
    previously this crashed with 'global size ... should be divisible')."""
    from articulatory_tpu.inference import LoadedModel

    gen = HiFiGANGenerator(
        in_channels=13, channels=16, upsample_scales=(5, 4),
        upsample_kernel_sizes=(10, 8), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),))
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    model = LoadedModel(model=gen, params=v["params"],
                        config={"generator_params": {"out_channels": 1}},
                        mutables={})
    c = rng.standard_normal((37, 13)).astype(np.float32)  # 37 % 4 != 0
    exact = model.inference(c)

    model.enable_sequence_parallel(4)
    sp = model.inference(c)
    assert sp.shape == exact.shape
    # padding only perturbs the trailing receptive-field window
    rf_out = 1000
    np.testing.assert_allclose(sp[: len(exact) - rf_out],
                               exact[: len(exact) - rf_out],
                               rtol=1e-5, atol=1e-6)


def test_decode_cli_sequence_parallel(tmp_path, monkeypatch, rng):
    """--sequence-parallel N through bin/decode: same wavs as unsharded."""
    import os
    import sys

    import yaml

    from articulatory_tpu.train.gan import GANTrainState
    from articulatory_tpu.utils.checkpoint import save_checkpoint
    from articulatory_tpu.utils.io import read_wav

    monkeypatch.chdir(tmp_path)
    config = {
        "sampling_rate": 16000, "hop_size": 80, "batch_max_steps": 800,
        "dataset_mode": "a2w", "format": "hdf5",
        "generator_type": "HiFiGANGenerator",
        "generator_params": {
            "in_channels": 13, "out_channels": 1, "channels": 16,
            "kernel_size": 7, "upsample_scales": [5, 4, 2, 2],
            "upsample_kernel_sizes": [10, 8, 4, 4],
            "resblock_kernel_sizes": [3], "resblock_dilations": [[1, 3]]},
    }
    gen = HiFiGANGenerator(
        in_channels=13, channels=16, upsample_scales=(5, 4, 2, 2),
        upsample_kernel_sizes=(10, 8, 4, 4), resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),))
    v = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    state = GANTrainState(params_g=v["params"], params_d={"d": jnp.zeros(1)},
                          opt_g={}, opt_d={}, steps=jnp.asarray(0, jnp.int32))
    os.makedirs("exp", exist_ok=True)
    save_checkpoint("exp/ckpt.ckpt", state)
    with open("exp/config.yml", "w") as f:
        yaml.dump(config, f)

    np.save("u0.npy", rng.standard_normal((96, 13)).astype(np.float32))
    np.save("u1.npy", rng.standard_normal((64, 13)).astype(np.float32))
    with open("feats.scp", "w") as f:
        f.write("u0 u0.npy\nu1 u1.npy\n")

    from articulatory_tpu.bin import decode

    base = ["decode", "--feats-scp", "feats.scp", "--checkpoint",
            "exp/ckpt.ckpt", "--config", "exp/config.yml", "--verbose", "0",
            "--bucket-frames", "32"]
    monkeypatch.setattr(sys, "argv", base + ["--outdir", "out_ref"])
    decode.main()
    monkeypatch.setattr(sys, "argv",
                        base + ["--outdir", "out_sp",
                                "--sequence-parallel", "4"])
    decode.main()

    for utt in ("u0", "u1"):
        ref, sr = read_wav(f"out_ref/{utt}_gen.wav")
        sp, _ = read_wav(f"out_sp/{utt}_gen.wav")
        assert len(ref) == len(sp)
        # wav files are 16-bit PCM; sharded float noise can flip an lsb
        np.testing.assert_allclose(sp.astype(np.int32),
                                   ref.astype(np.int32), atol=1)
