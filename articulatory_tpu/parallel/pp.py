"""Pipeline parallelism: stage-split generator serving across devices.

The HiFi-GAN generator is a linear chain (input conv → U upsample+MRF
groups → output conv), exposed stage-by-stage via
``HiFiGANGenerator.run_stages`` (models/hifigan.py). This module places
contiguous stage groups on different devices and streams microbatches
through them: each device holds only its stages' params and activations,
and JAX's per-device in-order async dispatch overlaps stage k of
microbatch m with stage k+1 of microbatch m-1 — a GPipe-style inference
pipeline with no explicit schedule code, the TPU-idiomatic formulation
(device-committed params + async transfers instead of NCCL send/recv
ranks).

When to use: models whose params + activations exceed one chip's HBM, or
serving topologies where stage-sharding beats batch-sharding (e.g. huge
non-AR synthesis batches where any single chip could not hold even its
1/K batch slice end to end). For fits-on-one-chip models, plain
data-parallel decode is simpler and faster.

The reference has no pipeline parallelism (SURVEY.md §2.10 — its only
parallelism is DDP); this is a TPU-native extension alongside tp.py / sp.py.

Exactness: chaining ``run_stages`` over contiguous ranges is the full
forward bit-for-bit (pinned unjitted in tests/test_pipeline_parallel.py);
the jitted pipeline matches the eager monolith to float noise (~3e-8 —
XLA fusion reorders float ops). Microbatch splitting is exact for the
batch-independent generator (no batch-coupled ops).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def even_boundaries(num_stages: int, num_groups: int) -> list[int]:
    """Split ``range(num_stages)`` into ``num_groups`` contiguous chunks.

    Returns ``num_groups + 1`` boundary indices (first 0, last num_stages).
    Chunks differ by at most one stage.
    """
    if not 1 <= num_groups <= num_stages:
        raise ValueError(f"need 1 <= num_groups <= {num_stages}, got {num_groups}")
    base, extra = divmod(num_stages, num_groups)
    bounds = [0]
    for g in range(num_groups):
        bounds.append(bounds[-1] + base + (1 if g < extra else 0))
    return bounds


def stage_param_subset(model, variables: dict, start: int, stop: int,
                       c_spec: Any, ar_spec: Any = None,
                       spk_spec: Any = None, ph_spec: Any = None) -> dict:
    """The subtree of ``variables['params']`` used by stages [start, stop).

    Discovered abstractly (``jax.eval_shape`` over ``model.init`` with the
    stage range) so the split never goes stale against the model definition.
    """
    kwargs = {}
    if start == 0:
        if ar_spec is not None:
            kwargs["ar"] = ar_spec
        if spk_spec is not None:
            kwargs["spk_id"] = spk_spec
        if ph_spec is not None:
            kwargs["ph"] = ph_spec

    def init_fn(c):
        return model.init(jax.random.PRNGKey(0), c, start, stop,
                          method="run_stages", **kwargs)

    shapes = jax.eval_shape(init_fn, c_spec)
    names = set(shapes["params"].keys())
    return {k: v for k, v in variables["params"].items() if k in names}


class PipelinedGenerator:
    """Stage-split generator over ``devices``; call like the model.

    Parameters
    ----------
    model : HiFiGANGenerator (or any module exposing ``run_stages`` +
        ``num_pipeline_stages``)
    variables : full variables dict (``{"params": ...}``)
    devices : one device per pipeline group (length K <= num_pipeline_stages)
    boundaries : optional explicit stage boundaries (K+1 ints, first 0,
        last num_pipeline_stages); default: stages split evenly
    num_microbatches : batch is split into this many microbatches per call
        (must divide the batch size); more microbatches = more overlap,
        smaller per-device working set
    """

    def __init__(self, model, variables: dict, devices: Sequence[Any],
                 boundaries: Sequence[int] | None = None,
                 num_microbatches: int = 2):
        n_stages = model.num_pipeline_stages
        k = len(devices)
        if boundaries is None:
            boundaries = even_boundaries(n_stages, k)
        boundaries = list(boundaries)
        if (len(boundaries) != k + 1 or boundaries[0] != 0
                or boundaries[-1] != n_stages
                or any(a >= b for a, b in zip(boundaries, boundaries[1:]))):
            raise ValueError(
                f"boundaries must be {k + 1} strictly increasing ints from 0 "
                f"to {n_stages}, got {boundaries}")
        if num_microbatches < 1:
            raise ValueError("num_microbatches must be >= 1")
        if getattr(model, "use_ph_loss", False):
            raise ValueError("pipeline serving is inference-only; the ph "
                             "auxiliary head (use_ph_loss) is a training "
                             "feature — disable it for serving")
        self.model = model
        self.devices = list(devices)
        self.boundaries = boundaries
        self.num_microbatches = num_microbatches
        self._variables = variables
        self._stage_params: list[dict] | None = None  # lazy, needs input specs
        self._stage_fns: list[Any] = []
        for start, stop in zip(boundaries, boundaries[1:]):
            self._stage_fns.append(self._make_stage_fn(start, stop))

    def _make_stage_fn(self, start: int, stop: int):
        model = self.model

        if start == 0:
            def fn(params, x, ar=None, spk_id=None, ph=None):
                return model.apply({"params": params}, x, start, stop,
                                   method="run_stages", ar=ar,
                                   spk_id=spk_id, ph=ph)
        else:
            def fn(params, x):
                return model.apply({"params": params}, x, start, stop,
                                   method="run_stages")
        return jax.jit(fn)

    def _place_params(self, c: Array, spk_id: Array | None,
                      ar: Array | None, ph: Array | None) -> None:
        """Subset + device-commit each group's params (once, lazily)."""
        spec = jax.ShapeDtypeStruct
        mb = c.shape[0] // self.num_microbatches

        def sub(x):
            return None if x is None else spec((mb,) + tuple(x.shape[1:]),
                                               x.dtype)

        self._stage_params = []
        for dev, (start, stop) in zip(self.devices,
                                      zip(self.boundaries, self.boundaries[1:])):
            sub_params = stage_param_subset(
                self.model, self._variables, start, stop,
                sub(c), ar_spec=sub(ar), spk_spec=sub(spk_id), ph_spec=sub(ph))
            self._stage_params.append(jax.device_put(sub_params, dev))

    def __call__(self, c: Array, spk_id: Array | None = None,
                 ar: Array | None = None, ph: Array | None = None) -> Array:
        # positional order matches HiFiGANGenerator.__call__ (c, spk_id, ar,
        # ph) so code written against the model signature ports unchanged
        b = c.shape[0]
        m = self.num_microbatches
        if b % m != 0:
            raise ValueError(f"batch {b} not divisible by num_microbatches {m}")
        if self._stage_params is None:
            self._place_params(c, spk_id, ar, ph)

        def split(x):
            return None if x is None else jnp.split(x, m, axis=0)

        cs, ars, spks, phs = split(c), split(ar), split(spk_id), split(ph)
        outs = []
        for j in range(m):  # async dispatch: the loop does not block, so
            x = cs[j]       # stage k of microbatch j overlaps stage k+1 of j-1
            for i, (fn, params, dev) in enumerate(
                    zip(self._stage_fns, self._stage_params, self.devices)):
                x = jax.device_put(x, dev)
                if i == 0:
                    kwargs = {}
                    if ars is not None:
                        kwargs["ar"] = jax.device_put(ars[j], dev)
                    if spks is not None:
                        kwargs["spk_id"] = jax.device_put(spks[j], dev)
                    if phs is not None:
                        kwargs["ph"] = jax.device_put(phs[j], dev)
                    x = fn(params, x, **kwargs)
                else:
                    x = fn(params, x)
            outs.append(x)
        return jnp.concatenate(outs, axis=0)
