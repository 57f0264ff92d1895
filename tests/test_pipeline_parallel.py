"""Pipeline-parallel serving (parallel/pp.py): exactness + placement.

The generator's staged forward (models/hifigan.py::run_stages) chained over
contiguous ranges must reproduce the monolithic forward bit-for-bit, and
PipelinedGenerator must produce the same output while holding each stage
group's params on its own device. The reference has no pipeline parallelism
(SURVEY.md §2.10) — this is a TPU-native extension; tested on the 8-device
virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from articulatory_tpu.models import HiFiGANGenerator
from articulatory_tpu.parallel.pp import (
    PipelinedGenerator,
    even_boundaries,
    stage_param_subset,
)


def _small_gen(**kw):
    kw.setdefault("in_channels", 13 + 16)
    kw.setdefault("out_channels", 1)
    kw.setdefault("channels", 32)
    kw.setdefault("kernel_size", 7)
    kw.setdefault("upsample_scales", (5, 4, 2, 2))
    kw.setdefault("upsample_kernel_sizes", (10, 8, 4, 4))
    kw.setdefault("resblock_kernel_sizes", (3,))
    kw.setdefault("resblock_dilations", ((1, 3),))
    kw.setdefault("use_ar", True)
    kw.setdefault("ar_input", 64)
    kw.setdefault("ar_hidden", 16)
    kw.setdefault("ar_output", 16)
    return HiFiGANGenerator(**kw)


@pytest.fixture(scope="module")
def gen_and_inputs():
    model = _small_gen()
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.standard_normal((4, 20, 13)), jnp.float32)
    ar = jnp.asarray(rng.standard_normal((4, 64, 1)) * 0.1, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), c, ar=ar)
    return model, variables, c, ar


def test_even_boundaries():
    assert even_boundaries(6, 3) == [0, 2, 4, 6]
    assert even_boundaries(6, 4) == [0, 2, 4, 5, 6]
    assert even_boundaries(6, 1) == [0, 6]
    assert even_boundaries(6, 6) == [0, 1, 2, 3, 4, 5, 6]
    with pytest.raises(ValueError):
        even_boundaries(6, 7)
    with pytest.raises(ValueError):
        even_boundaries(6, 0)


def test_staged_forward_matches_monolithic(gen_and_inputs):
    """Chaining run_stages over any contiguous split == full forward."""
    model, variables, c, ar = gen_and_inputs
    full = model.apply(variables, c, ar=ar)
    n = model.num_pipeline_stages
    assert n == len(model.upsample_scales) + 2

    for bounds in ([0, 1, n], [0, 3, n], [0, 2, 4, n],
                   even_boundaries(n, n)):
        x = c
        for start, stop in zip(bounds, bounds[1:]):
            kwargs = {"ar": ar} if start == 0 else {}
            x = model.apply(variables, x, start, stop,
                            method="run_stages", **kwargs)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(full))


def test_stage_param_subsets_partition_params(gen_and_inputs):
    """Every param is used by exactly one stage group."""
    model, variables, c, ar = gen_and_inputs
    n = model.num_pipeline_stages
    bounds = even_boundaries(n, 3)
    spec = jax.ShapeDtypeStruct
    seen = []
    for start, stop in zip(bounds, bounds[1:]):
        sub = stage_param_subset(
            model, variables, start, stop, spec(c.shape, c.dtype),
            ar_spec=spec(ar.shape, ar.dtype) if start == 0 else None)
        seen.extend(sub.keys())
    assert sorted(seen) == sorted(variables["params"].keys())


@pytest.mark.parametrize("num_devices,num_microbatches", [(2, 2), (4, 1), (4, 4)])
def test_pipelined_generator_matches(gen_and_inputs, num_devices,
                                     num_microbatches):
    model, variables, c, ar = gen_and_inputs
    devices = jax.devices()[:num_devices]
    assert len(devices) == num_devices
    pipe = PipelinedGenerator(model, variables, devices,
                              num_microbatches=num_microbatches)
    out = pipe(c, ar=ar)
    full = model.apply(variables, c, ar=ar)
    # jitted stages vs eager monolith: XLA fusion reorders float ops
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)
    # each stage group's params live on (only) its device
    for dev, params in zip(pipe.devices, pipe._stage_params):
        leaves = jax.tree.leaves(params)
        assert leaves, "stage group with no params"
        for leaf in leaves:
            assert leaf.devices() == {dev}


def test_pipelined_generator_custom_boundaries(gen_and_inputs):
    model, variables, c, ar = gen_and_inputs
    n = model.num_pipeline_stages  # 6
    devices = jax.devices()[:2]
    pipe = PipelinedGenerator(model, variables, devices, boundaries=[0, 1, n])
    out = pipe(c, ar=ar)
    full = model.apply(variables, c, ar=ar)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_run_stages_rejects_bad_ranges(gen_and_inputs):
    """Degenerate/out-of-range stage windows are errors, not silent
    stage-0 execution (regression: [0, 0) ran the conditioning + input
    conv because the stage-0 block was gated on start_stage == 0 only)."""
    model, variables, c, ar = gen_and_inputs
    n = model.num_pipeline_stages
    for start, stop in [(0, 0), (3, 2), (0, n + 1), (-1, n), (n, n)]:
        with pytest.raises(ValueError):
            model.apply(variables, c, start, stop, method="run_stages",
                        ar=ar if start == 0 else None)


def test_pipelined_generator_positional_order_matches_model(gen_and_inputs):
    """PipelinedGenerator.__call__ takes (c, spk_id, ar, ph) — the model's
    positional order — so code written against HiFiGANGenerator.__call__
    ports unchanged (regression: ar and spk_id were swapped)."""
    import inspect

    model, variables, c, ar = gen_and_inputs
    pipe_params = list(inspect.signature(
        PipelinedGenerator.__call__).parameters)[1:]
    model_params = list(inspect.signature(
        HiFiGANGenerator.__call__).parameters)[1:]
    assert pipe_params == model_params
    # and a positional call routes ar into the ar slot (None spk_id)
    pipe = PipelinedGenerator(model, variables, jax.devices()[:2])
    out = pipe(c, None, ar)
    full = model.apply(variables, c, ar=ar)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_pipelined_generator_validation(gen_and_inputs):
    model, variables, c, ar = gen_and_inputs
    devices = jax.devices()[:2]
    with pytest.raises(ValueError):
        PipelinedGenerator(model, variables, devices, boundaries=[0, 2])
    with pytest.raises(ValueError):
        PipelinedGenerator(model, variables, devices, num_microbatches=0)
    pipe = PipelinedGenerator(model, variables, devices, num_microbatches=3)
    with pytest.raises(ValueError):
        pipe(c, ar=ar)  # batch 4 not divisible by 3
    with pytest.raises(ValueError):
        PipelinedGenerator(_small_gen(use_ph_loss=True, num_ph=5),
                           variables, devices)
