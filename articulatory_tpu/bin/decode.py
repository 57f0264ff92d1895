#!/usr/bin/env python3
"""Decode dumped features with a trained generator.

Parity target: reference articulatory/bin/decode.py:103-362 (same CLI, same
per-dataset_mode input selection, AR loop vs full-utterance inference,
``<utt>_gen.wav`` / ``<utt>_gen.npy`` outputs, RTF reporting).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np
import yaml
from tqdm import tqdm

import jax.numpy as jnp

from articulatory_tpu.bin.preprocess import set_logging
from articulatory_tpu.data.datasets import (
    ArtDataset,
    ArtSCPDataset,
    AudioSCPDataset,
    MelDataset,
    MelSCPDataset,
)
from articulatory_tpu.data.collate import is_wave_output_mode
from articulatory_tpu.data.transforms import get_transform
from articulatory_tpu.inference import ar_loop, load_model
from articulatory_tpu.utils.io import read_hdf5, write_wav


def main():
    parser = argparse.ArgumentParser(
        description="Decode dumped features with trained generator.")
    parser.add_argument("--feats-scp", "--scp", default=None, type=str)
    parser.add_argument("--dumpdir", default=None, type=str)
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", default=None, type=str)
    parser.add_argument("--normalize-before", default=False, action="store_true")
    parser.add_argument("--bucket-frames", default=64, type=int,
                        help="pad full-utterance inference lengths to this "
                             "multiple to bound XLA compile count (0 = exact)")
    parser.add_argument("--decode-batch-size", default=1, type=int,
                        help="batch N utterances through the AR loop "
                             "(throughput mode for a2w; 1 = reference-exact "
                             "sequential decode)")
    parser.add_argument("--int8-weights", default=False, action="store_true",
                        help="decode with int8-quantized weights (symmetric "
                             "per-out-channel; folds weight norm first). "
                             "Quality-gated by tools/int8_quality_ab.sh — "
                             "see docs/DESIGN.md §7 for the verdict.")
    parser.add_argument("--bf16-weights", default=False, action="store_true",
                        help="store weights as bfloat16 (folds weight norm "
                             "first; compute dtypes unchanged). Halves the "
                             "weight-bandwidth-bound single-stream scan's "
                             "HBM weight traffic. Quality-gated by "
                             "tools/bf16_weights_quality_ab.sh.")
    parser.add_argument("--ar-scan", default=False, action="store_true",
                        help="run chunked-AR decode as ONE compiled "
                             "lax.scan dispatch per utterance instead of a "
                             "host loop (latency mode; removes the "
                             "per-chunk dispatch+sync roundtrip). Covers "
                             "a2w wave decode AND w2a inversion. First use "
                             "pays a one-time scan compile, amortized by "
                             "the persistent compilation cache. Ignored for "
                             "wsola / multimodal / non-AR decodes. Composes "
                             "with --decode-batch-size: each lane group "
                             "becomes one scan dispatch.")
    parser.add_argument("--ar-scan-bucket", default=4, type=int,
                        help="with --ar-scan, round the per-utterance chunk "
                             "count up to this multiple so arbitrary "
                             "lengths share compiled executables (0 = "
                             "exact chunk count, one compile per length)")
    parser.add_argument("--sequence-parallel", default=0, type=int,
                        help="shard the TIME axis of full-utterance (non-AR) "
                             "inference over N devices (parallel/sp.py); "
                             "bounds per-device activation memory on very "
                             "long utterances. Ignored for AR models. "
                             "Lengths not divisible by N are zero-padded "
                             "and trimmed: only the final receptive-field "
                             "window can differ marginally from unsharded "
                             "inference.")
    parser.add_argument("--verbose", type=int, default=1)
    args = parser.parse_args()
    set_logging(args.verbose)

    from articulatory_tpu.utils.platform import honor_jax_platforms

    honor_jax_platforms()

    from articulatory_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.config is None:
        dirname = os.path.dirname(args.checkpoint)
        args.config = os.path.join(dirname, "config.yml")
    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)
    config.update(vars(args))

    if (args.feats_scp is not None) == (args.dumpdir is not None):
        raise ValueError("Please specify either --dumpdir or --feats-scp.")

    dataset_mode = config.get("dataset_mode", "default")
    transform = get_transform(config.get("transform")) \
        if config.get("transform") else None
    input_transform = config.get("input_transform")
    input_transform = (get_transform(input_transform)
                       if input_transform is not None else transform)

    # dataset per mode (reference decode.py:196-266)
    if dataset_mode in ("default", "m2w"):
        if args.dumpdir is not None:
            if config["format"] == "hdf5":
                dataset = MelDataset(args.dumpdir, mel_query="*.h5",
                                     mel_load_fn=lambda x: read_hdf5(x, "feats"),
                                     return_utt_id=True)
            else:
                dataset = MelDataset(args.dumpdir, mel_query="*-feats.npy",
                                     mel_load_fn=np.load, return_utt_id=True)
        else:
            dataset = MelSCPDataset(args.feats_scp, return_utt_id=True)
    elif dataset_mode in ("a2w", "art", "ph2a", "ph2m", "a2m"):
        if args.dumpdir is not None:
            # match the reference's format dispatch (decode.py:231-246):
            # hdf5 dumps store the input stream under the "feats" key
            if config["format"] == "hdf5":
                art_query = "*.h5"
                art_load_fn = lambda x: read_hdf5(x, "feats")  # noqa: E731
            else:
                art_query = "*-feats.npy"
                art_load_fn = np.load
            dataset = ArtDataset(args.dumpdir, query=art_query,
                                 load_fn=art_load_fn, return_utt_id=True,
                                 transform=input_transform)
        else:
            dataset = ArtSCPDataset(args.feats_scp, return_utt_id=True,
                                    transform=input_transform)
    elif dataset_mode == "a2w_mult":
        from articulatory_tpu.data.multimodal import ArtSCPMultDataset

        dataset = ArtSCPMultDataset(args.feats_scp, return_utt_id=True,
                                    transform=config.get("transform"))
    elif dataset_mode == "w2a":
        assert args.feats_scp is not None
        dataset = AudioSCPDataset(args.feats_scp, return_utt_id=True,
                                  return_sampling_rate=False)
    else:
        # generic x2y modes read articulatory-style inputs
        if args.dumpdir is not None:
            if config["format"] == "hdf5":
                dataset = ArtDataset(args.dumpdir, query="*.h5",
                                     load_fn=lambda x: read_hdf5(x, "feats"),
                                     return_utt_id=True,
                                     transform=input_transform)
            else:
                dataset = ArtDataset(args.dumpdir, query="*-feats.npy",
                                     load_fn=np.load, return_utt_id=True,
                                     transform=input_transform)
        else:
            dataset = ArtSCPDataset(args.feats_scp, return_utt_id=True,
                                    transform=input_transform)
    logging.info(f"The number of features to be decoded = {len(dataset)}.")

    model = load_model(args.checkpoint, config)
    logging.info(f"Loaded model parameters from {args.checkpoint}.")
    if args.int8_weights and not model.quantized:
        model.quantize_int8()
        logging.info("Quantized weights to int8 (per-out-channel symmetric).")
    if args.bf16_weights:
        if args.int8_weights or model.quantized:
            # model.quantized also covers checkpoints auto-quantized by a
            # `weight_quant: int8` config key — casting their dequant
            # scale arrays to bf16 would silently stack extra rounding
            parser.error("--bf16-weights is exclusive with int8 weights "
                         "(flag or config weight_quant: int8)")
        model.to_bf16_weights()
        logging.info("Stored weights as bfloat16 (weight norm folded).")

    os.makedirs(args.outdir, exist_ok=True)
    use_ar = config["generator_params"].get("use_ar", False)

    if args.sequence_parallel > 1:
        if use_ar:
            logging.warning(
                "--sequence-parallel ignored: AR chunked decode is serial "
                "with tiny per-chunk shapes; SP targets full-utterance "
                "(non-AR) inference.")
        else:
            model.enable_sequence_parallel(args.sequence_parallel)
            logging.info(f"Sequence-parallel inference over "
                         f"{args.sequence_parallel} devices.")
    sr = config["sampling_rate"]
    hop = config["hop_size"]

    do_wsola = bool(config.get("wsola", False))
    # wave output for named wave modes AND generic x2y modes (whose y resolves
    # to audio — e.g. the shipped mri mode, see data/collate.py
    # parse_dataset_mode); the reference instead refuses such modes at its
    # dataset dispatch (decode.py:266)
    is_wave = is_wave_output_mode(dataset_mode)

    if (args.decode_batch_size > 1 and use_ar and not do_wsola
            and (is_wave or dataset_mode == "w2a")
            and dataset_mode not in ("a2w_mult", "a2w_pcd")):
        from articulatory_tpu.inference import ar_loop_batched

        items = [(it[0], np.asarray(it[1], np.float32)) for it in dataset]
        total_time = total_len = 0.0
        for i in range(0, len(items), args.decode_batch_size):
            group = items[i:i + args.decode_batch_size]
            start = time.time()
            # --ar-scan composes with lanes: the whole group runs as ONE
            # lax.scan dispatch (same lane semantics, no per-chunk roundtrip)
            outs = ar_loop_batched(model, [c for _, c in group], config,
                                   scan=bool(args.ar_scan))
            elapsed = time.time() - start
            for (utt_id, c), out in zip(group, outs):
                if is_wave:
                    write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                              out, sr)
                    total_len += len(out) / sr
                else:  # w2a trajectories; input rows are waveform samples
                    np.save(os.path.join(args.outdir, f"{utt_id}_gen.npy"),
                            np.asarray(out, np.float32), allow_pickle=False)
                    total_len += len(c) / sr
            total_time += elapsed
        logging.info(
            f"Finished batched generation of {len(items)} utterances "
            f"(batch {args.decode_batch_size}); throughput = "
            f"{total_len / max(total_time, 1e-9):.1f}x realtime "
            f"(effective RTF {total_time / max(total_len, 1e-9):.6f}).")
        return

    use_scan = bool(getattr(args, "ar_scan", False))
    if use_scan and not (use_ar and not do_wsola
                         and (is_wave or dataset_mode == "w2a")
                         and dataset_mode not in ("a2w_mult", "a2w_pcd")):
        logging.warning("--ar-scan ignored: the compiled scan path covers "
                        "plain chunked-AR wave decode and w2a inversion "
                        "(no wsola/multimodal/non-AR).")
        use_scan = False
    if use_scan:
        from articulatory_tpu.inference import ar_loop_scan

    total_rtf = 0.0
    total_time = 0.0
    total_len = 0.0
    n = 0
    with tqdm(dataset, desc="[decode]") as pbar:
        for idx, item in enumerate(pbar, 1):
            utt_id, c = item[0], item[1]
            modality = item[2] if dataset_mode == "a2w_mult" else None
            if dataset_mode in ("ph2a", "ph2m"):
                # phoneme-id inputs feed an embedding (reference decode.py:346)
                c = np.asarray(c, np.int32)
            else:
                c = np.asarray(c, np.float32)
            start = time.time()
            if is_wave:
                if use_scan and modality is None:
                    out = ar_loop_scan(model, c, config,
                                       chunk_bucket=args.ar_scan_bucket)
                elif use_ar:
                    out = ar_loop(model, c, config, do_wsola=do_wsola,
                                  modality=modality)
                else:
                    out = model.inference(
                        c, normalize_before=args.normalize_before,
                        bucket_frames=args.bucket_frames or None).reshape(-1)
                elapsed = time.time() - start
                if do_wsola:
                    # 50%-overlap chunks: save each chunk + its input window
                    signals, arts = out
                    for cyi, cy in enumerate(signals):
                        write_wav(os.path.join(args.outdir,
                                               f"{utt_id}_{cyi}_gen.wav"),
                                  np.asarray(cy), sr)
                        np.save(os.path.join(args.outdir, f"{utt_id}_{cyi}.npy"),
                                np.asarray(arts[cyi]))
                    dur = sum(len(np.asarray(cy)) for cy in signals) / sr
                else:
                    wav = np.asarray(out).squeeze()
                    dur = len(wav) / sr
                    write_wav(os.path.join(args.outdir, f"{utt_id}_gen.wav"),
                              wav, sr)
            else:
                # feature-domain output (art / w2a / ph2m / ph2a / a2m)
                if use_scan:
                    out = ar_loop_scan(model, c, config,
                                       chunk_bucket=args.ar_scan_bucket)
                elif use_ar:
                    out = ar_loop(model, c, config, do_wsola=do_wsola,
                                  modality=modality)
                else:
                    out = model.inference(c, normalize_before=args.normalize_before,
                                          bucket_frames=args.bucket_frames or None)
                elapsed = time.time() - start
                # input duration: w2a inputs are waveform samples; other
                # feature-domain modes feed frames at sr/hop_size Hz
                if dataset_mode == "w2a":
                    dur = len(c) / sr
                else:
                    dur = len(c) * config["hop_size"] / sr
                np.save(os.path.join(args.outdir, f"{utt_id}_gen.npy"),
                        np.asarray(out).astype(np.float32), allow_pickle=False)
            rtf = elapsed / max(dur, 1e-9)
            total_rtf += rtf
            total_time += elapsed
            total_len += dur
            n += 1
            pbar.set_postfix({"RTF": rtf})

    logging.info(f"Finished generation of {n} utterances (avg time "
                 f"{total_time / max(n, 1):.3f} s, avg len "
                 f"{total_len / max(n, 1):.3f} s).")
    logging.info(f"Average RTF = {total_rtf / max(n, 1):.6f}; "
                 f"throughput = {total_len / max(total_time, 1e-9):.1f}x realtime.")


if __name__ == "__main__":
    main()
