#!/usr/bin/env python3
"""Speech-to-EMA with a linear regression model over WavLM features.

Parity target: reference egs/ema/voc1/local/linear_inference.py — WavLM-large
layer-9 hidden states -> sklearn joblib regressor -> EMA .npy. Assumes the
waveform is 16 kHz. Requires cached HF weights (microsoft/wavlm-large) in
offline environments.

Usage: python local/linear_inference.py <wav> <linear.joblib> <out.npy>
"""

from __future__ import annotations

import os
import sys

import numpy as np
from joblib import load

from articulatory_tpu.utils.io import read_wav
from articulatory_tpu.utils.platform import honor_jax_platforms

LAYER_NUM = 9


def wavlm_features(audio: np.ndarray, layer_num: int = LAYER_NUM) -> np.ndarray:
    """WavLM hidden states at ``layer_num`` (reference layer 9).

    ARTICULATORY_WAVLM_MODEL overrides the HF id (e.g. a local
    save_pretrained directory — how the test suite exercises this path with
    a tiny random-init model in the zero-egress environment); tiny models
    with fewer layers clamp to their last hidden state."""
    import torch
    from transformers import WavLMModel

    name = os.environ.get("ARTICULATORY_WAVLM_MODEL", "microsoft/wavlm-large")
    model = WavLMModel.from_pretrained(name)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(audio).float()[None],
                    output_hidden_states=True)
    layer = min(layer_num, len(out.hidden_states) - 1)
    return out.hidden_states[layer][0].numpy()


def main():
    # re-apply JAX_PLATFORMS after any sitecustomize jax import
    honor_jax_platforms()
    path, reg_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    audio, sampling_rate = read_wav(path)
    assert sampling_rate == 16000
    feature = wavlm_features(audio)
    reg = load(reg_path)
    pred = reg.predict(feature)
    np.save(out_path, pred)


if __name__ == "__main__":
    main()
