"""Tensor parallelism: a dp x tp (2 x 4) 2-D mesh with channel-sharded
generator/discriminator params produces the same step as single-device
training (GSPMD guarantees exactness; this pins the sharding plumbing —
parallel/tp.py spec rules, opt-state sharding inheritance, 2-D shard_batch).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from articulatory_tpu.parallel.mesh import shard_batch
from articulatory_tpu.parallel.tp import make_dp_tp_mesh, shard_tree_tp, tp_spec

from test_data_parallel import _setup


def test_tp_spec_rules():
    assert tp_spec((7, 16, 32), 4) == P(None, None, "model")
    assert tp_spec((32,), 4) == P("model")
    assert tp_spec((6,), 4) == P()      # not divisible
    assert tp_spec((4,), 4) == P()      # below 2*tp floor
    assert tp_spec((), 4) == P()


def test_dp2_tp4_matches_single_device(rng):
    assert len(jax.devices()) >= 8, "conftest provides 8 CPU devices"
    state, batch, step = _setup(rng)

    # single device baseline
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    repl = NamedSharding(mesh1, P())
    s0 = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    b0 = jax.tree.map(lambda x: jax.device_put(x, repl), batch)
    lr = jnp.float32(1e-3)
    s1, m1 = step(s0, b0, jax.random.PRNGKey(7), lr, lr)
    s1 = jax.device_get(s1)

    # 2-D mesh: batch over data, generator channels over model. The
    # discriminator stays replicated (data-parallel only): it holds a tiny
    # fraction of the FLOPs, and XLA's SPMD convolution partitioner
    # check-fails on its grouped convs' backward pass when channel-sharded
    # (convolution_handler.cc batch-group check).
    mesh = make_dp_tp_mesh(tp=4, num_devices=8)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    repl = NamedSharding(mesh, P())
    st = state.replace(
        params_g=shard_tree_tp(state.params_g, mesh),
        params_d=jax.tree.map(lambda x: jax.device_put(x, repl), state.params_d),
        opt_g=shard_tree_tp(state.opt_g, mesh),
        opt_d=jax.tree.map(lambda x: jax.device_put(x, repl), state.opt_d),
        steps=jax.device_put(state.steps, repl),
        mutables_g=jax.tree.map(lambda x: jax.device_put(x, repl),
                                state.mutables_g))
    # some leaves really are sharded on the model axis
    sharded = [x for x in jax.tree.leaves(st.params_g)
               if x.ndim and x.shape[-1] % 4 == 0 and x.shape[-1] >= 8]
    assert sharded and any(
        "model" in str(x.sharding.spec) for x in sharded)

    bt = shard_batch(batch, mesh)
    s2, m2 = step(st, bt, jax.random.PRNGKey(7), lr, lr)
    s2 = jax.device_get(s2)

    for k in ("train/generator_loss", "train/discriminator_loss"):
        np.testing.assert_allclose(float(m2[k]), float(m1[k]),
                                   rtol=2e-3, atol=1e-5)
    for l1, l2 in zip(jax.tree.leaves(s1.params_g),
                      jax.tree.leaves(s2.params_g)):
        np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                                   rtol=2e-3, atol=2e-5)


def test_train_cli_tensor_parallel(tmp_path, monkeypatch, rng):
    """bin/train.py with `tensor_parallel: 2` trains end-to-end on the
    virtual 8-device mesh (dp sized to divide the batch, tp=2)."""
    import os
    import sys

    import yaml

    from test_e2e_pipeline import make_corpus, tiny_yaml

    root = str(tmp_path)
    monkeypatch.chdir(root)
    make_corpus(root, rng)
    cfg_path = tiny_yaml(root)
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    cfg["tensor_parallel"] = 2
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from articulatory_tpu.bin import compute_statistics, normalize, preprocess
    from articulatory_tpu.bin import train as train_bin

    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "preprocess", "--wav-scp", f"data/{name}/wav.scp",
            "--dumpdir", f"dump/{name}/raw", "--config", cfg_path,
            "--verbose", "0"])
        preprocess.main()
    monkeypatch.setattr(sys, "argv", [
        "compute_statistics", "--rootdir", "dump/tr_set/raw",
        "--config", cfg_path, "--dumpdir", "dump/tr_set", "--verbose", "0"])
    compute_statistics.main()
    for name in ("tr_set", "dev_set"):
        monkeypatch.setattr(sys, "argv", [
            "normalize", "--rootdir", f"dump/{name}/raw",
            "--dumpdir", f"dump/{name}/norm", "--stats", "dump/tr_set/stats.h5",
            "--config", cfg_path, "--verbose", "0"])
        normalize.main()

    monkeypatch.setattr(sys, "argv", [
        "train", "--train-dumpdir", "dump/tr_set/norm",
        "--dev-dumpdir", "dump/dev_set/norm", "--outdir", "exp/tp",
        "--config", cfg_path, "--verbose", "0"])
    train_bin.main()
    ckpts = [f for f in os.listdir("exp/tp") if f.endswith(".ckpt")]
    assert ckpts, "no checkpoint saved under tensor_parallel training"
