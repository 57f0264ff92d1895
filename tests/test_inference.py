"""Inference-path tests: ar_loop parity vs the reference driver, checkpoint
roundtrip, scheduler parity vs torch."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

CAR_GEN_CFG = dict(in_channels=13 + 16, out_channels=1, channels=32,
                   kernel_size=7, upsample_scales=[5, 4, 2, 2],
                   upsample_kernel_sizes=[10, 8, 4, 4],
                   resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]],
                   use_ar=True, ar_input=64, ar_hidden=16, ar_output=16)


def _car_config():
    return {"dataset_mode": "a2w", "batch_max_steps": 800, "hop_size": 80,
            "sampling_rate": 16000, "generator_params": dict(CAR_GEN_CFG)}


class _JaxModelShim:
    """Minimal LoadedModel-like callable for ar_loop tests."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self.mutables = {}

    def __call__(self, c, ar=None):
        import functools

        @functools.lru_cache(maxsize=None)
        def _jit():
            return jax.jit(lambda p, c, ar: self.model.apply(
                {"params": p, **self.mutables}, c, ar=ar))

        return _jit()(self.params, c, ar)


@requires_reference
def test_ar_loop_matches_reference(reference, rng):
    """Same weights, same input: our ar_loop output == reference ar_loop."""
    import torch
    from articulatory.bin.decode import ar_loop as ref_ar_loop
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.inference import ar_loop
    from articulatory_tpu.models.hifigan import HiFiGANGenerator
    from articulatory_tpu.utils.torch_import import import_hifigan_generator

    torch.manual_seed(0)
    ref = RefGen(**CAR_GEN_CFG)
    ref.eval()
    params = import_hifigan_generator(ref.state_dict(), CAR_GEN_CFG)
    ours = HiFiGANGenerator(**{**CAR_GEN_CFG,
                               "upsample_scales": tuple(CAR_GEN_CFG["upsample_scales"]),
                               "upsample_kernel_sizes": tuple(CAR_GEN_CFG["upsample_kernel_sizes"]),
                               "resblock_kernel_sizes": tuple(CAR_GEN_CFG["resblock_kernel_sizes"]),
                               "resblock_dilations": ((1, 3),)})

    config = _car_config()
    # 35 frames -> 3 chunks of 10 with a short last chunk
    x = rng.standard_normal((35, 13)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref_ar_loop(ref, torch.from_numpy(x), config).numpy()

    shim = _JaxModelShim(ours, params)
    y_ours = np.asarray(ar_loop(shim, x, config))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)

    # quality-parity statement: MCD between the two frameworks' outputs with
    # shared weights is far below the 0.1 dB budget (BASELINE.md)
    from articulatory_tpu.eval.mcd import mel_cepstral_distortion

    mcd = mel_cepstral_distortion(y_ours, y_ref, 16000, fft_size=256,
                                  hop_size=64)
    assert mcd < 0.01, f"MCD {mcd} dB vs reference with shared weights"


@requires_reference
def test_wsola_ar_loop_matches_reference(reference, rng):
    """50%-overlap WSOLA decode path parity (reference decode.py:84-100)."""
    import torch
    from articulatory.bin.decode import ar_loop as ref_ar_loop
    from articulatory.models import HiFiGANGenerator as RefGen

    from articulatory_tpu.inference import ar_loop
    from articulatory_tpu.models.hifigan import HiFiGANGenerator

    cfg = dict(CAR_GEN_CFG)
    torch.manual_seed(0)
    ref = RefGen(**cfg)
    ref.eval()
    from articulatory_tpu.utils.torch_import import import_hifigan_generator

    params = import_hifigan_generator(ref.state_dict(), cfg)
    ours = HiFiGANGenerator(**{**cfg,
                               "upsample_scales": (5, 4, 2, 2),
                               "upsample_kernel_sizes": (10, 8, 4, 4),
                               "resblock_kernel_sizes": (3,),
                               "resblock_dilations": ((1, 3),)})

    config = _car_config()
    config["generator_params"]["extra_art"] = False
    x = rng.standard_normal((30, 13)).astype(np.float32)
    with torch.no_grad():
        outs_ref, ins_ref = ref_ar_loop(ref, torch.from_numpy(x), config,
                                        do_wsola=True)
    shim = _JaxModelShim(ours, params)
    outs, ins = ar_loop(shim, x, config, do_wsola=True)
    assert len(outs) == len(outs_ref)
    for a, b in zip(outs, outs_ref):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   rtol=1e-3, atol=1e-4)


@requires_reference
def test_w2a_ar_loop_matches_reference(reference, rng):
    """Inversion direction (w2a): our ar_loop AND the compiled scan match
    the reference ar_loop with shared BiGRU weights (decode.py:44-51),
    including the trailing sub-hop chunk drop (decode.py:57-58)."""
    import torch
    from articulatory.bin.decode import ar_loop as ref_ar_loop
    from articulatory.models import BiGRU as RefBiGRU

    from articulatory_tpu.inference import ar_loop, ar_loop_scan
    from articulatory_tpu.models import BiGRU
    from articulatory_tpu.utils.torch_import import import_bigru

    # reference convention: in_channels includes ar_output (gru input dim)
    cfg = dict(in_channels=13, hidden_size=16, out_channels=4, use_ar=True,
               ar_input=32, ar_hidden=8, ar_output=8)
    torch.manual_seed(0)
    ref = RefBiGRU(**cfg)
    ref.eval()
    params, variables = import_bigru(ref.state_dict(), cfg)
    ours = BiGRU(**cfg)

    config = {"dataset_mode": "w2a", "batch_max_steps": 100, "hop_size": 80,
              "sampling_rate": 16000, "generator_params": dict(cfg)}
    # 250 frames -> chunks [100, 100, 50]; the 50 < hop tail is dropped
    x = rng.standard_normal((250, 5)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref_ar_loop(ref, torch.from_numpy(x), config).numpy()
    assert y_ref.shape == (200, 4)

    shim = _JaxModelShim(ours, params)
    shim.mutables = variables
    y_ours = np.asarray(ar_loop(shim, x, config))
    assert y_ours.shape == y_ref.shape
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-3, atol=1e-4)

    y_scan = np.asarray(ar_loop_scan(shim, x, config))
    assert y_scan.shape == y_ref.shape
    np.testing.assert_allclose(y_scan, y_ref, rtol=1e-3, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from articulatory_tpu.models.hifigan import HiFiGANGenerator
    from articulatory_tpu.train.gan import GANTrainState
    from articulatory_tpu.train.schedulers import MultiStepLR
    from articulatory_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_state,
        save_checkpoint,
    )

    model = HiFiGANGenerator(in_channels=13, channels=16,
                             upsample_scales=(4, 2), upsample_kernel_sizes=(8, 4),
                             resblock_kernel_sizes=(3,), resblock_dilations=((1,),))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 13)))
    tx = optax.adam(1e-4)
    state = GANTrainState(params_g=v["params"], params_d=v["params"],
                          opt_g=tx.init(v["params"]), opt_d=tx.init(v["params"]),
                          steps=jnp.asarray(123, jnp.int32))
    scheds = {"generator": MultiStepLR(1e-4, [100], 0.5),
              "discriminator": MultiStepLR(1e-4, [100], 0.5)}
    scheds["generator"].step_count = 123
    scheds["generator"]._update(None)

    path = str(tmp_path / "ckpt.ckpt")
    save_checkpoint(path, state, schedulers=scheds, epochs=7)

    # fresh state, restore
    state2 = GANTrainState(params_g=jax.tree.map(jnp.zeros_like, v["params"]),
                           params_d=jax.tree.map(jnp.zeros_like, v["params"]),
                           opt_g=tx.init(v["params"]), opt_d=tx.init(v["params"]),
                           steps=jnp.asarray(0, jnp.int32))
    scheds2 = {"generator": MultiStepLR(1e-4, [100], 0.5),
               "discriminator": MultiStepLR(1e-4, [100], 0.5)}
    payload = load_checkpoint(path)
    restored, epochs = restore_state(state2, payload, schedulers=scheds2)
    assert epochs == 7
    assert int(restored.steps) == 123
    assert scheds2["generator"].step_count == 123
    a = jax.tree.leaves(state.params_g)[0]
    b = jax.tree.leaves(restored.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_schedulers_match_torch():
    import torch

    from articulatory_tpu.train.schedulers import (
        ExponentialLR,
        MultiStepLR,
        ReduceLROnPlateau,
        StepLR,
    )

    p = torch.nn.Parameter(torch.zeros(1))
    for ours, t_cls, t_kw, o_kw in [
        (MultiStepLR, torch.optim.lr_scheduler.MultiStepLR,
         {"milestones": [3, 7], "gamma": 0.5}, {"milestones": [3, 7], "gamma": 0.5}),
        (StepLR, torch.optim.lr_scheduler.StepLR,
         {"step_size": 4, "gamma": 0.1}, {"step_size": 4, "gamma": 0.1}),
        (ExponentialLR, torch.optim.lr_scheduler.ExponentialLR,
         {"gamma": 0.9}, {"gamma": 0.9}),
    ]:
        opt = torch.optim.Adam([p], lr=1e-3)
        tsched = t_cls(opt, **t_kw)
        osched = ours(1e-3, **o_kw)
        for step in range(12):
            opt.step()
            tsched.step()
            osched.step()
            np.testing.assert_allclose(osched.lr, opt.param_groups[0]["lr"],
                                       rtol=1e-9, err_msg=f"{ours} @ {step}")

    # plateau behavior
    opt = torch.optim.Adam([p], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=0.5, patience=2)
    osched = ReduceLROnPlateau(1e-3, factor=0.5, patience=2)
    metrics = [1.0, 0.9, 0.95, 0.96, 0.97, 0.98, 0.99, 0.5, 0.6, 0.7, 0.8, 0.9]
    for m in metrics:
        tsched.step(m)
        osched.step(m)
        np.testing.assert_allclose(osched.lr, opt.param_groups[0]["lr"], rtol=1e-9)


def test_lambda_lr_state_dict_serializable():
    """LambdaLR's callable must be excluded from state_dict (torch parity) or
    msgpack checkpointing crashes at the first save interval."""
    import flax.serialization

    from articulatory_tpu.train.schedulers import LambdaLR

    sched = LambdaLR(1e-3, lr_lambda=lambda step: 0.95 ** step)
    sched.step()
    blob = flax.serialization.msgpack_serialize(
        {"scheduler": sched.state_dict()})
    state = flax.serialization.msgpack_restore(blob)
    fresh = LambdaLR(1e-3, lr_lambda=lambda step: 0.95 ** step)
    fresh.load_state_dict(state["scheduler"])
    assert fresh.step_count == 1
    fresh.step()
    assert abs(fresh.lr - 1e-3 * 0.95 ** 2) < 1e-12
