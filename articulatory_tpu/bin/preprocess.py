#!/usr/bin/env python3
"""Preprocess audio into dumped wave+logmel features.

Parity target: reference articulatory/bin/preprocess.py (same CLI flags,
same dump layout: hdf5 files with 'wave' and 'feats' datasets or -wave/-feats
npy pairs, same audio/mel length lock audio[: len(mel) * hop]).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml
from tqdm import tqdm

from articulatory_tpu.data.datasets import AudioDataset, AudioSCPDataset
from articulatory_tpu.ops.audio import resample, trim_silence
from articulatory_tpu.ops.stft import logmelfilterbank_np
from articulatory_tpu.utils.io import read_wav, write_hdf5


def set_logging(verbose: int) -> None:
    level = logging.DEBUG if verbose > 1 else logging.INFO if verbose > 0 else logging.WARN
    logging.basicConfig(
        level=level,
        format="%(asctime)s (%(module)s:%(lineno)d) %(levelname)s: %(message)s")


def main():
    parser = argparse.ArgumentParser(
        description="Preprocess audio and then extract features.")
    parser.add_argument("--wav-scp", "--scp", default=None, type=str)
    parser.add_argument("--segments", default=None, type=str)
    parser.add_argument("--rootdir", default=None, type=str)
    parser.add_argument("--dumpdir", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    set_logging(args.verbose)

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))

    if (args.wav_scp is not None) == (args.rootdir is not None):
        raise ValueError("Please specify either --rootdir or --wav-scp.")

    if args.rootdir is not None:
        dataset = AudioDataset(args.rootdir, "*.wav",
                               audio_load_fn=read_wav, return_utt_id=True)
    else:
        dataset = AudioSCPDataset(args.wav_scp, segments=args.segments,
                                  return_utt_id=True, return_sampling_rate=True)

    os.makedirs(args.dumpdir, exist_ok=True)

    for item in tqdm(dataset):
        utt_id, payload = item[0], item[1:]
        audio, fs = payload if len(payload) == 2 else payload[0]
        assert audio.ndim == 1, f"{utt_id} seems to be multi-channel signal."
        assert np.abs(audio).max() <= 1.0, \
            f"{utt_id} seems to be different from 16 bit PCM."
        assert fs == config["sampling_rate"], \
            f"{utt_id} seems to have a different sampling rate."

        if config.get("trim_silence", False):
            audio, _ = trim_silence(
                audio, top_db=config["trim_threshold_in_db"],
                frame_length=config["trim_frame_size"],
                hop_length=config["trim_hop_size"])

        if "sampling_rate_for_feats" not in config:
            x = audio
            sampling_rate = config["sampling_rate"]
            hop_size = config["hop_size"]
        else:
            x = resample(audio, fs, config["sampling_rate_for_feats"])
            sampling_rate = config["sampling_rate_for_feats"]
            assert config["hop_size"] * config["sampling_rate_for_feats"] % fs == 0
            hop_size = config["hop_size"] * config["sampling_rate_for_feats"] // fs

        mel = logmelfilterbank_np(
            x, sampling_rate, fft_size=config["fft_size"], hop_size=hop_size,
            win_length=config["win_length"], window=config["window"],
            num_mels=config["num_mels"], fmin=config["fmin"],
            fmax=config["fmax"], log_base=config.get("log_base", 10.0))

        audio = np.pad(audio, (0, config["fft_size"]), mode="reflect")
        audio = audio[: len(mel) * config["hop_size"]]
        assert len(mel) * config["hop_size"] == len(audio)

        if config.get("global_gain_scale", 1.0) > 0.0:
            audio = audio * config["global_gain_scale"]
        if np.abs(audio).max() >= 1.0:
            logging.warning(f"{utt_id} causes clipping. "
                            f"it is better to re-consider global gain scale.")
            continue

        if config["format"] == "hdf5":
            path = os.path.join(args.dumpdir, f"{utt_id}.h5")
            write_hdf5(path, "wave", audio.astype(np.float32))
            write_hdf5(path, "feats", mel.astype(np.float32))
        elif config["format"] == "npy":
            np.save(os.path.join(args.dumpdir, f"{utt_id}-wave.npy"),
                    audio.astype(np.float32), allow_pickle=False)
            np.save(os.path.join(args.dumpdir, f"{utt_id}-feats.npy"),
                    mel.astype(np.float32), allow_pickle=False)
        else:
            raise ValueError("support only hdf5 or npy format.")


if __name__ == "__main__":
    main()
