"""Model registry: YAML class names -> flax modules.

Mirrors the reference's ``getattr(articulatory.models, config["generator_type"])``
resolution (reference bin/train.py:1649-1669); use ``get_model_class(name)``.
"""

from articulatory_tpu.models.hifigan import (  # noqa: F401
    HiFiGANGenerator,
    HiFiGANPeriodDiscriminator,
    HiFiGANMultiPeriodDiscriminator,
    HiFiGANScaleDiscriminator,
    HiFiGANMultiScaleDiscriminator,
    HiFiGANMultiScaleMultiPeriodDiscriminator,
)
from articulatory_tpu.models.melgan import (  # noqa: F401
    MelGANGenerator,
    MelGANDiscriminator,
    MelGANMultiScaleDiscriminator,
)
from articulatory_tpu.models.parallel_wavegan import (  # noqa: F401
    ParallelWaveGANGenerator,
    ParallelWaveGANDiscriminator,
    ResidualParallelWaveGANDiscriminator,
)
from articulatory_tpu.models.style_melgan import (  # noqa: F401
    StyleMelGANGenerator,
    StyleMelGANDiscriminator,
)
from articulatory_tpu.models.gblock_gen import GBlockGenerator  # noqa: F401
from articulatory_tpu.models.rnn import BiGRU  # noqa: F401
from articulatory_tpu.models.transformer import Transformer  # noqa: F401

_REGISTRY = {
    "HiFiGANGenerator": HiFiGANGenerator,
    "HiFiGANPeriodDiscriminator": HiFiGANPeriodDiscriminator,
    "HiFiGANMultiPeriodDiscriminator": HiFiGANMultiPeriodDiscriminator,
    "HiFiGANScaleDiscriminator": HiFiGANScaleDiscriminator,
    "HiFiGANMultiScaleDiscriminator": HiFiGANMultiScaleDiscriminator,
    "HiFiGANMultiScaleMultiPeriodDiscriminator": HiFiGANMultiScaleMultiPeriodDiscriminator,
    "MelGANGenerator": MelGANGenerator,
    "MelGANDiscriminator": MelGANDiscriminator,
    "MelGANMultiScaleDiscriminator": MelGANMultiScaleDiscriminator,
    "ParallelWaveGANGenerator": ParallelWaveGANGenerator,
    "ParallelWaveGANDiscriminator": ParallelWaveGANDiscriminator,
    "ResidualParallelWaveGANDiscriminator": ResidualParallelWaveGANDiscriminator,
    "StyleMelGANGenerator": StyleMelGANGenerator,
    "StyleMelGANDiscriminator": StyleMelGANDiscriminator,
    "GBlockGenerator": GBlockGenerator,
    "BiGRU": BiGRU,
    "Transformer": Transformer,
}

# generators whose forward signature is (noise, aux) rather than (aux, ...)
NOISE_DRIVEN_GENERATORS = {"ParallelWaveGANGenerator"}
# generators that draw their own noise stream via rngs
RNG_GENERATORS = {"StyleMelGANGenerator"}
# discriminators that need an rng stream (random windowing)
RNG_DISCRIMINATORS = {"StyleMelGANDiscriminator"}


def get_model_class(name: str):
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model type: {name!r}. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def build_model(name: str, params: dict):
    """Instantiate a registered model from YAML kwargs (lists -> tuples;
    compute_dtype strings like "bfloat16" -> jnp dtypes)."""
    import jax.numpy as jnp

    def freeze(k, v):
        if isinstance(v, list):
            return tuple(freeze(k, x) for x in v)
        if k == "compute_dtype" and isinstance(v, str):
            return jnp.dtype({"bf16": "bfloat16", "f32": "float32",
                              "fp32": "float32"}.get(v, v))
        if isinstance(v, dict):
            return {kk: freeze(kk, vv) for kk, vv in v.items()}
        return v

    cls = get_model_class(name)
    kwargs = {k: freeze(k, v) for k, v in dict(params or {}).items()}
    return cls(**kwargs)
