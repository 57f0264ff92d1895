#!/usr/bin/env bash
# EMA-to-speech recipe (TPU-native) — 4 stages mirroring the reference
# egs/ema/voc1/run.sh: 0 data prep, 1 feature extraction, 2 training,
# 3 decoding. Kaldi perl job launchers are replaced by utils/run_jobs.py.

set -euo pipefail

. ./path.sh
. ./cmd.sh

stage=-1
stop_stage=3
n_jobs=8
conf=conf/mri2w_hifigan_car.yaml
train_set=napa_train
dev_set=napa_val
eval_set=napa_test
expdir=""
resume=""
pretrain=""
checkpoint=""

. ./utils/parse_options.sh 2>/dev/null || true

tag=$(basename "${conf}" .yaml)
if [ -z "${expdir}" ]; then
  expdir=exp/${train_set}_${tag}
fi

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "Stage 0: Data preparation (MRI corpus)"
    # split wavs into train/dev/eval sets (feats.scp for the MRI track
    # features must be provided per set, as in the reference recipe)
    ./local/data_prep.sh --fs 20000 \
        --train_set "${train_set}" --dev_set "${dev_set}" \
        --eval_set "${eval_set}" downloads mri_napa data
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "Stage 1: Feature extraction"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        dumpdir=dump/${name}/raw
        mkdir -p "${dumpdir}" log
        shards=""
        for j in $(seq 1 ${n_jobs}); do shards="${shards} ${dumpdir}/wav.${j}.scp"; done
        python3 utils/split_scp.py "data/${name}/wav.scp" ${shards}
        ${train_cmd} JOB=1:${n_jobs} "log/preprocess.${name}.JOB.log" \
            python3 -m articulatory_tpu.bin.preprocess \
                --wav-scp "${dumpdir}/wav.JOB.scp" \
                --dumpdir "${dumpdir}" --config "${conf}" --verbose 0
    done
    python3 -m articulatory_tpu.bin.compute_statistics \
        --rootdir "dump/${train_set}/raw" --config "${conf}" \
        --dumpdir "dump/${train_set}"
    for name in "${train_set}" "${dev_set}" "${eval_set}"; do
        python3 -m articulatory_tpu.bin.normalize \
            --rootdir "dump/${name}/raw" --dumpdir "dump/${name}/norm" \
            --stats "dump/${train_set}/stats.h5" --config "${conf}"
    done
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "Stage 2: Training (${expdir})"
    mkdir -p "${expdir}"
    python3 -m articulatory_tpu.bin.train \
        --train-dumpdir "dump/${train_set}/norm" \
        --dev-dumpdir "dump/${dev_set}/norm" \
        --outdir "${expdir}" --config "${conf}" \
        ${pretrain:+--pretrain "${pretrain}"} \
        ${resume:+--resume "${resume}"}
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "Stage 3: Decoding"
    [ -z "${checkpoint}" ] && checkpoint=${expdir}/best_mel_ckpt.pkl
    outdir=${expdir}/wav/$(basename "${checkpoint}" .pkl)
    for name in "${dev_set}" "${eval_set}"; do
        python3 -m articulatory_tpu.bin.decode \
            --feats-scp "data/${name}/feats.scp" \
            --checkpoint "${checkpoint}" \
            --outdir "${outdir}/${name}"
    done
fi

echo "Finished."
