"""Hybrid-precision decode through the user-facing load_model/ar_loop path.

`hybrid_precision: true` + `compute_dtype: "bfloat16"` in generator_params
is the quality-certified decode configuration (docs/DESIGN.md §7) and the
bench.py default; this pins the YAML-string plumbing (build_model dtype
mapping), load_model construction, and the AR loop running the hybrid
forward — the exact surface tools/bf16_quality_ab.sh and the benches drive
on hardware.
"""

import numpy as np

import jax
import jax.numpy as jnp

GEN_PARAMS = dict(in_channels=13 + 8, out_channels=1, channels=32,
                  kernel_size=7, upsample_scales=[5, 4, 2, 2],
                  upsample_kernel_sizes=[10, 8, 4, 4],
                  resblock_kernel_sizes=[3], resblock_dilations=[[1, 3]],
                  use_ar=True, ar_input=64, ar_hidden=8, ar_output=8)


def _write_ckpt(tmp_path):
    import flax.serialization

    from articulatory_tpu.models import HiFiGANGenerator

    model = HiFiGANGenerator(
        **{**GEN_PARAMS, "upsample_scales": (5, 4, 2, 2),
           "upsample_kernel_sizes": (10, 8, 4, 4),
           "resblock_kernel_sizes": (3,), "resblock_dilations": ((1, 3),)})
    c = jnp.zeros((1, 10, 13), jnp.float32)
    ar = jnp.zeros((1, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), c, ar=ar)["params"]
    payload = {"model": {"generator": jax.tree.map(np.asarray, params)},
               "mutables": {}, "optimizer": {}, "scheduler": {},
               "steps": 0, "epochs": 0}
    ckpt = tmp_path / "best_mel_ckpt.pkl"
    with open(ckpt, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    return str(ckpt)


def test_hybrid_precision_ar_decode_matches_f32(tmp_path, rng):
    from articulatory_tpu.inference import ar_loop, load_model

    ckpt = _write_ckpt(tmp_path)
    base = {"generator_type": "HiFiGANGenerator",
            "generator_params": dict(GEN_PARAMS), "format": "hdf5",
            "dataset_mode": "a2w", "batch_max_steps": 800,
            "sampling_rate": 16000, "hop_size": 80}
    hybrid_cfg = {**base,
                  "generator_params": {**GEN_PARAMS,
                                       "compute_dtype": "bfloat16",
                                       "hybrid_precision": True}}

    m_f32 = load_model(ckpt, base)
    m_hyb = load_model(ckpt, hybrid_cfg)
    # YAML string -> jnp dtype mapping survived load_model
    assert m_hyb.model.compute_dtype == jnp.bfloat16
    assert m_hyb.model.hybrid_precision is True

    feats = rng.standard_normal((30, 13)).astype(np.float32)  # 3 AR chunks
    y32 = np.asarray(ar_loop(m_f32, feats, base))
    yhy = np.asarray(ar_loop(m_hyb, feats, hybrid_cfg))

    assert yhy.shape == y32.shape == (30 * 80,)
    assert np.isfinite(yhy).all()
    # the hybrid output is f32 (head/tail run full precision)
    assert yhy.dtype == np.float32
    # bf16 interior actually ran (outputs differ from pure f32) but the
    # f32 feedback path keeps the short-horizon decode close
    assert np.abs(yhy - y32).max() > 0
    rel = np.linalg.norm(yhy - y32) / (np.linalg.norm(y32) + 1e-9)
    assert rel < 0.15, rel
