#!/usr/bin/env python3
"""Speech-to-EMA inversion (public API).

Parity target: reference egs/ema/voc1/local/predict_ema.py — extracts either
HuBERT-large hidden states (x interp-factor linear interpolation to 200 Hz)
or z-scored 13-dim MFCCs, then runs the w2a AR loop / full inference and
saves .npy EMA trajectories.

SSL features use HF transformers (facebook/hubert-large-ll60k); in offline
environments without cached weights the MFCC path still works. Exp-id
conventions follow the reference: '_h2' -> hubert features; 'hprc' prefix ->
interp factor 2 / hop 160, else 4 / 80.

NOTE on SSL parity: in this zero-egress environment the HuBERT path is
verified STRUCTURALLY (tiny random-init transformers models driven end to
end, plus exact interpolation parity vs torch — tests/test_ssl_inversion.py);
numerical equivalence with the reference's s3prl hubert_large_ll60k feature
stack (reference predict_ema.py:25-30) needs the pretrained weights and is
not certified here.

Usage: python local/predict_ema.py <exp_id or exp_dir> <input_wav_dir> <output_dir>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import yaml
from scipy import stats
from tqdm import tqdm

from articulatory_tpu.inference import ar_loop, load_model
from articulatory_tpu.ops.mfcc import mfcc_np
from articulatory_tpu.utils.io import read_wav
from articulatory_tpu.utils.platform import honor_jax_platforms


def wav2mfcc(wav, sr, num_mfcc=13, n_mels=40, n_fft=320, hop_length=160):
    feat = mfcc_np(wav, sr, n_mfcc=num_mfcc, n_fft=n_fft,
                   hop_length=hop_length, n_mels=n_mels)
    return stats.zscore(feat, axis=None)


_HUBERT = None


def _load_hubert():
    """HuBERT model, cached. ARTICULATORY_HUBERT_MODEL overrides the HF id
    (e.g. a local save_pretrained directory — how the test suite exercises
    this path with a tiny random-init model in the zero-egress environment)."""
    global _HUBERT
    if _HUBERT is None:
        from transformers import HubertModel

        name = os.environ.get("ARTICULATORY_HUBERT_MODEL",
                              "facebook/hubert-large-ll60k")
        _HUBERT = HubertModel.from_pretrained(name)
        _HUBERT.eval()
    return _HUBERT


def hubert_features(audio: np.ndarray, interp_factor: int) -> np.ndarray:
    """HuBERT last hidden states, linearly upsampled to the frame rate.

    Matches reference predict_ema.py:85-90: hidden_states[-1] ->
    F.interpolate(mode='linear', align_corners=False) by a factor of
    ``interp_factor`` (x2 at hop 160 / x4 at hop 80 -> 200 Hz)."""
    import torch

    model = _load_hubert()
    with torch.no_grad():
        states = model(torch.from_numpy(audio).float()[None]).last_hidden_state
        target = states.shape[1] * interp_factor
        feat = torch.nn.functional.interpolate(
            states.transpose(1, 2), size=target, mode="linear",
            align_corners=False).transpose(1, 2)[0]
    return feat.numpy()


def main():
    # a sitecustomize may have frozen JAX_PLATFORMS at interpreter startup;
    # re-apply so JAX_PLATFORMS=cpu works on TPU hosts (see utils/platform)
    honor_jax_platforms()
    exp_id = sys.argv[1]
    wav_d = sys.argv[2]
    output_feats_d = sys.argv[3]
    # optional trailing flag (the 3 positional args keep the reference's CLI
    # shape): run the AR inversion as ONE compiled lax.scan dispatch per
    # utterance instead of a host chunk loop (inference.ar_loop_scan)
    # optional `--batch N`: run N wavs as parallel AR lanes
    # (inference.ar_loop_batched; with --ar-scan each lane group is ONE
    # compiled dispatch — the served-throughput path, see DESIGN.md §5).
    # Lane outputs can differ from the sequential loop only in the final
    # partial chunk (zero lane padding through the BiGRU recurrence).
    extra = list(sys.argv[4:])
    use_scan, lane_batch = False, 1
    while extra:
        tok = extra.pop(0)
        if tok == "--ar-scan":
            use_scan = True
        elif tok == "--batch":
            if not extra:
                sys.exit("predict_ema.py: --batch requires an integer value")
            val = extra.pop(0)
            try:
                lane_batch = int(val)
            except ValueError:
                sys.exit(f"predict_ema.py: --batch expects an integer, "
                         f"got {val!r}")
            if lane_batch < 1:
                sys.exit(f"predict_ema.py: --batch must be >= 1, "
                         f"got {lane_batch}")
        else:
            sys.exit(f"predict_ema.py: unrecognized argument {tok!r} "
                     f"(known: --ar-scan, --batch N)")

    input_modality = "hubert" if "_h2" in exp_id else "mfcc"
    if os.path.basename(exp_id).startswith("hprc"):
        interp_factor, hop_length = 2, 160
    else:
        interp_factor, hop_length = 4, 80

    exp_dir = exp_id if os.path.isdir(exp_id) else f"exp/{exp_id}"
    checkpoint = os.path.join(exp_dir, "best_mel_ckpt.pkl")
    with open(os.path.join(exp_dir, "config.yml")) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    model = load_model(checkpoint, config)

    files = sorted(f for f in os.listdir(wav_d) if f.endswith(".wav"))
    os.makedirs(output_feats_d, exist_ok=True)

    def featurize(f):
        audio, sr = read_wav(os.path.join(wav_d, f))
        if input_modality == "hubert":
            feat = hubert_features(audio, interp_factor)
        else:
            feat = wav2mfcc(audio, sr=sr, hop_length=hop_length).T  # (T, C)
        return feat.astype(np.float32)

    use_ar = config["generator_params"].get("use_ar", False)
    if lane_batch > 1 and use_ar:
        from articulatory_tpu.inference import ar_loop_batched

        for i in tqdm(range(0, len(files), lane_batch)):
            group = files[i:i + lane_batch]
            feats = [featurize(f) for f in group]
            preds = ar_loop_batched(model, feats, config, scan=use_scan)
            for f, pred in zip(group, preds):
                np.save(os.path.join(output_feats_d,
                                     f[: f.rfind(".")] + ".npy"),
                        np.asarray(pred))
        return

    for f in tqdm(files):
        feat = featurize(f)
        fid = f[: f.rfind(".")]
        if use_ar:
            if use_scan:
                from articulatory_tpu.inference import ar_loop_scan

                pred = ar_loop_scan(model, feat, config)
            else:
                pred = ar_loop(model, feat, config)
        else:
            pred = model.inference(feat)
        np.save(os.path.join(output_feats_d, fid + ".npy"), np.asarray(pred))


if __name__ == "__main__":
    main()
