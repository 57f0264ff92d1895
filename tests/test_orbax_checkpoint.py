"""Orbax checkpoint backend roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.train.gan import GANTrainState
from articulatory_tpu.train.schedulers import MultiStepLR
from articulatory_tpu.utils.checkpoint import (
    load_checkpoint,
    restore_state,
    save_checkpoint_orbax,
)


def test_orbax_roundtrip(tmp_path):
    model = HiFiGANGenerator(in_channels=13, channels=16,
                             upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
                             resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    tx = optax.adam(1e-4)
    state = GANTrainState(params_g=v["params"], params_d=v["params"],
                          opt_g=tx.init(v["params"]), opt_d=tx.init(v["params"]),
                          steps=jnp.asarray(42, jnp.int32))
    scheds = {"generator": MultiStepLR(1e-4, [100], 0.5),
              "discriminator": MultiStepLR(1e-4, [100], 0.5)}

    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, jax.device_get(state), schedulers=scheds,
                          epochs=3)

    payload = load_checkpoint(path)  # auto-detects the directory backend
    state2 = GANTrainState(params_g=jax.tree.map(jnp.zeros_like, v["params"]),
                           params_d=jax.tree.map(jnp.zeros_like, v["params"]),
                           opt_g=tx.init(v["params"]), opt_d=tx.init(v["params"]),
                           steps=jnp.asarray(0, jnp.int32))
    restored, epochs = restore_state(state2, payload)
    assert epochs == 3
    assert int(restored.steps) == 42
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
