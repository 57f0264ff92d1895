#!/bin/bash
# bf16 generator-compute quality A/B on real hardware.
#
# Trains the flagship E2W HiFi-CAR config for a few thousand steps on a
# synthetic corpus (tools/make_synth_corpus.py), then decodes the held-out
# dev set twice from the SAME checkpoint — f32 and bf16 generator compute —
# and reports:
#   (a) MCD(bf16 decode, f32 decode)   -> the numeric cost of bf16
#   (b) MCD(f32 decode, ground truth)  -> absolute quality anchor
#   (c) MCD(bf16 decode, ground truth)
# plus both decode RTFs. The 0.1 dB budget (BASELINE.md: "MCD within 0.1 dB
# of the PyTorch reference") is the acceptance bar for making bf16 a decode
# default anywhere.
#
# Usage: tools/bf16_quality_ab.sh [workdir] [train_steps]
# Runs on the TPU by default (the axon platform is forced by sitecustomize).
set -euo pipefail

WORK=${1:-/tmp/bf16ab}
STEPS=${2:-4000}
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO:${PYTHONPATH:-}"
CONF_SRC="$REPO/egs/ema/voc1/conf/e2w_hifigan_car.yaml"

mkdir -p "$WORK"
if [ ! -d "$WORK/corpus" ]; then
    python3 "$REPO/tools/make_synth_corpus.py" --root "$WORK/corpus" \
        --n-utts 80 --dev-utts 8
fi

python3 - "$CONF_SRC" "$WORK/train.yaml" "$STEPS" << 'EOF'
import sys, yaml
cfg = yaml.safe_load(open(sys.argv[1]))
cfg["train_max_steps"] = int(sys.argv[3])
cfg["save_interval_steps"] = max(500, int(sys.argv[3]) // 2)
cfg["eval_interval_steps"] = 1000
cfg["log_interval_steps"] = 200
cfg["use_device_cache"] = True  # corpus fits HBM; host ships indices only
yaml.dump(cfg, open(sys.argv[2], "w"))
bf = dict(cfg)
bf["generator_params"] = dict(cfg["generator_params"], compute_dtype="bfloat16")
yaml.dump(bf, open(sys.argv[2].replace("train.yaml", "bf16.yaml"), "w"))
hy = dict(cfg)
hy["generator_params"] = dict(cfg["generator_params"],
                              compute_dtype="bfloat16", hybrid_precision=True)
yaml.dump(hy, open(sys.argv[2].replace("train.yaml", "hybrid.yaml"), "w"))
EOF

cd "$WORK"
if [ ! -f dump/tr_set/stats.h5 ]; then
    for name in tr_set dev_set; do
        mkdir -p "dump/$name/raw"
        python3 -m articulatory_tpu.bin.preprocess \
            --wav-scp "corpus/data/$name/wav.scp" --dumpdir "dump/$name/raw" \
            --config train.yaml --verbose 0
    done
    python3 -m articulatory_tpu.bin.compute_statistics \
        --rootdir dump/tr_set/raw --config train.yaml --dumpdir dump/tr_set
    for name in tr_set dev_set; do
        python3 -m articulatory_tpu.bin.normalize --rootdir "dump/$name/raw" \
            --dumpdir "dump/$name/norm" --stats dump/tr_set/stats.h5 \
            --config train.yaml
    done
fi

CKPT="exp/ab/checkpoint-${STEPS}steps.ckpt"
if [ ! -f "$CKPT" ]; then
    python3 -m articulatory_tpu.bin.train \
        --train-dumpdir dump/tr_set/norm --dev-dumpdir dump/dev_set/norm \
        --outdir exp/ab --config train.yaml --data-root corpus/data
fi

for variant in f32 bf16 hybrid; do
    conf=train.yaml
    [ "$variant" = bf16 ] && conf=bf16.yaml
    [ "$variant" = hybrid ] && conf=hybrid.yaml
    python3 -m articulatory_tpu.bin.decode \
        --feats-scp corpus/data/dev_set/feats.scp --checkpoint "$CKPT" \
        --config "$conf" --outdir "out_$variant" \
        2> "decode_$variant.log" || { cat "decode_$variant.log"; exit 1; }
    echo "== decode_$variant RTF:"; tail -2 "decode_$variant.log"
done

echo "== MCD(bf16, f32) — numeric cost of bf16 =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_bf16 --ref-dir out_f32
echo "== MCD(f32, ground truth) =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_f32 \
    --ref-dir corpus/wavs --dtw
echo "== MCD(bf16, ground truth) =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_bf16 \
    --ref-dir corpus/wavs --dtw
echo "== MCD(hybrid, f32) — numeric cost of hybrid bf16 =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_hybrid --ref-dir out_f32
echo "== MCD(hybrid, ground truth) =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_hybrid \
    --ref-dir corpus/wavs --dtw

# Self-drift control: the chunked-AR decode is chaotic (past the Lyapunov
# horizon any perturbation decorrelates waveforms), so MCD(variant, f32)
# alone can't separate "worse quality" from "different trajectory of the
# same quality". Decode the SAME f32 config from a 1-ulp-perturbed
# checkpoint: that MCD is the f32 decode's OWN noise cone. A precision
# variant whose (a) divergence is ~the cone and (b) ground-truth MCD is
# within the 0.1 dB budget of f32's is numerically indistinguishable from
# an f32 decode; one outside the cone genuinely degrades.
# perturb the SAME checkpoint the f32/bf16/hybrid arms decode
python3 "$REPO/tools/perturb_ckpt.py" "$CKPT" exp/ab/ulp_control.ckpt
python3 -m articulatory_tpu.bin.decode \
    --feats-scp corpus/data/dev_set/feats.scp \
    --checkpoint exp/ab/ulp_control.ckpt \
    --config train.yaml --outdir out_f32ulp 2> decode_f32ulp.log \
    || { cat decode_f32ulp.log; exit 1; }
echo "== MCD(f32-1ulp, f32) — the f32 decode's own noise cone =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_f32ulp --ref-dir out_f32
echo "== MCD(f32-1ulp, ground truth) =="
python3 -m articulatory_tpu.bin.compute_mcd --gen-dir out_f32ulp \
    --ref-dir corpus/wavs --dtw
