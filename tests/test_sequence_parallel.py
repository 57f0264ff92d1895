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
