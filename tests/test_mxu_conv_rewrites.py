"""The MXU lowering rewrites in ops/conv.py must be numerically equivalent
to the plain lax lowering they replace (C_in=1 tap-matmul, grouped->block-
diagonal densification, period-disc conv2d tap-matmul)."""

import numpy as np
import pytest

import articulatory_tpu.ops.conv as C


@pytest.fixture
def plain():
    """Temporarily disable the rewrites to get the reference lowering."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        old = C.MXU_REWRITES
        C.MXU_REWRITES = False
        try:
            yield
        finally:
            C.MXU_REWRITES = old

    return ctx


@pytest.mark.parametrize("k,stride,padding,dilation", [
    (15, 1, 7, 1),       # MSD layer 0
    (3, 1, 1, 1),        # PWG disc first layer
    (5, 3, 2, 1),        # strided
    (7, 1, 9, 3),        # dilated, over-padded
    (4, 2, (1, 2), 1),   # even kernel, asymmetric pad
])
def test_cin1_tap_matmul(plain, k, stride, padding, dilation):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 101, 1)).astype(np.float32)
    w = rng.standard_normal((k, 1, 12)).astype(np.float32)
    b = rng.standard_normal((12,)).astype(np.float32)
    got = C.conv1d(x, w, b, stride=stride, padding=padding, dilation=dilation)
    with plain():
        want = C.conv1d(x, w, b, stride=stride, padding=padding,
                        dilation=dilation)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_degenerate_short_input_falls_through(plain):
    """T < K with no padding: t_out == 0; the rewrite must defer to the
    native lowering's empty-output behavior instead of slicing negatively."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 5, 1)).astype(np.float32)
    w = rng.standard_normal((15, 1, 8)).astype(np.float32)
    got = C.conv1d(x, w, None)
    with plain():
        want = C.conv1d(x, w, None)
    assert got.shape == want.shape == (2, 0, 8)


@pytest.mark.parametrize("c_in,k", [(4, 7), (13, 7), (16, 16), (11, 5)])
def test_narrow_cin_tap_matmul(plain, c_in, k):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64, c_in)).astype(np.float32)
    w = rng.standard_normal((k, c_in, 24)).astype(np.float32) * 0.1
    b = rng.standard_normal((24,)).astype(np.float32)
    got = C.conv1d(x, w, b, stride=2, padding=(k - 1) // 2)
    with plain():
        want = C.conv1d(x, w, b, stride=2, padding=(k - 1) // 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("c_in,c_out,groups,expect_dense", [
    (128, 128, 4, True),     # MSD layer 1
    (128, 256, 16, True),    # MSD layer 2
    (256, 512, 16, True),    # MSD layer 3
    (512, 1024, 16, False),  # MSD layer 4: dense costs 32 passes vs 16
    (1024, 1024, 16, False),
])
def test_grouped_densify(plain, c_in, c_out, groups, expect_dense):
    assert C._dense_beats_grouped(c_in, c_out, groups) == expect_dense
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 40, c_in)).astype(np.float32) * 0.1
    w = rng.standard_normal((5, c_in // groups, c_out)).astype(np.float32) * 0.05
    got = C.conv1d(x, w, None, stride=2, padding=2, groups=groups)
    with plain():
        want = C.conv1d(x, w, None, stride=2, padding=2, groups=groups)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_grouped_densify_gradients(plain):
    """Autodiff through the densified form matches the grouped form."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 30, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 4, 16)) * 0.1, jnp.float32)

    def loss(x, w):
        return jnp.sum(C.conv1d(x, w, None, padding=2, groups=4) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    with plain():
        gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx0, atol=1e-4)
    np.testing.assert_allclose(gw, gw0, atol=1e-4)


@pytest.mark.parametrize("kh,sh,wid,c_in", [
    (5, 3, 7, 1),    # period-7 disc first layer
    (5, 3, 2, 32),   # period-2 disc mid layer
    (2, 1, 11, 16),  # final even-kernel layer, period 11
    (5, 1, 3, 1),
])
def test_conv2d_width_fold(plain, kh, sh, wid, c_in):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 60, wid, c_in)).astype(np.float32)
    w = rng.standard_normal((kh, 1, c_in, 8)).astype(np.float32) * 0.1
    b = rng.standard_normal((8,)).astype(np.float32)
    got = C.conv2d(x, w, b, stride=(sh, 1), padding=((kh - 1) // 2, 0))
    with plain():
        want = C.conv2d(x, w, b, stride=(sh, 1), padding=((kh - 1) // 2, 0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv2d_width_fold_gradients(plain):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 30, 3, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, 1, 4, 8)) * 0.1, jnp.float32)

    def loss(x, w):
        return jnp.sum(C.conv2d(x, w, None, stride=(3, 1),
                                padding=(2, 0)) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    with plain():
        gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, gx0, atol=1e-4)
    np.testing.assert_allclose(gw, gw0, atol=1e-4)


def test_scale_disc_parity_under_rewrites():
    """Full scale-discriminator forward: rewrites on == rewrites off."""
    import jax

    from articulatory_tpu.models.hifigan import HiFiGANScaleDiscriminator

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 512, 1)).astype(np.float32) * 0.1
    m = HiFiGANScaleDiscriminator()
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)
    old = C.MXU_REWRITES
    C.MXU_REWRITES = False
    try:
        want = m.apply(params, x)
    finally:
        C.MXU_REWRITES = old
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(g, w_, atol=2e-5)
