"""Shipped recipe configs: models + criterion must build from each YAML
(shape-level init via jax.eval_shape — no FLOPs)."""

import glob
import os

import pytest
import yaml

import jax
import jax.numpy as jnp

from articulatory_tpu.config import fix_generator_params
from articulatory_tpu.models import build_model
from articulatory_tpu.train.gan import GANCriterion
from articulatory_tpu.train.optimizers import build_optimizer
from articulatory_tpu.train.schedulers import build_scheduler

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "egs", "*", "voc1", "conf", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    with open(path) as f:
        config = yaml.safe_load(f)

    gp = fix_generator_params(config["generator_params"])
    gen = build_model(config["generator_type"], gp)
    disc = build_model(config["discriminator_type"],
                       config["discriminator_params"])

    in_feats = gp["in_channels"] - (gp.get("ar_output", 128)
                                    if gp.get("use_ar") else 0)
    c = jnp.zeros((1, 25, in_feats), jnp.float32)
    kwargs = {}
    if gp.get("use_ar"):
        kwargs["ar"] = jnp.zeros((1, gp["ar_input"], gp["out_channels"]),
                                 jnp.float32)

    # shape-level init (no compute)
    shapes = jax.eval_shape(lambda: gen.init(jax.random.PRNGKey(0), c, **kwargs))
    n_params = sum(int(jnp.prod(jnp.asarray(x.shape)))
                   for x in jax.tree.leaves(shapes["params"]))
    assert n_params > 1_000_000, f"{path}: suspiciously small generator"

    t_out = 25 * int(jnp.prod(jnp.asarray(gp["upsample_scales"])))
    d_shapes = jax.eval_shape(
        lambda: disc.init({"params": jax.random.PRNGKey(0),
                           "window": jax.random.PRNGKey(1)},
                          jnp.zeros((1, t_out + gp.get("ar_input", 0), 1))))
    assert d_shapes["params"]

    crit = GANCriterion(config)
    assert crit.use_mel_loss
    build_optimizer(config["generator_optimizer_type"],
                    config["generator_optimizer_params"],
                    config.get("generator_grad_norm", -1))
    build_scheduler(config["generator_scheduler_type"],
                    config["generator_optimizer_params"]["lr"],
                    config["generator_scheduler_params"])

    # interval sanity (reference invariant: batch_max_steps % hop == 0)
    assert config["batch_max_steps"] % config["hop_size"] == 0
