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
conf=conf/e2w_hifigan.yaml
train_set=mngu0_train_fnema
dev_set=mngu0_val_fnema
eval_set=mngu0_test_fnema
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
    echo "Stage 0: Data preparation"
    # MNGU0: parse .ema -> npy + splits, extract pitch, combine pitch+EMA
    python3 local/mk_ema_feats.py
    python3 local/pitch.py downloads/emadata/cin_us_mngu0 --hop 80
    python3 local/combine_feats.py downloads/emadata/cin_us_mngu0 \
        --feats pitch actions -o fnema
    for name in mngu0_train mngu0_val mngu0_test; do
        mkdir -p "data/${name}_fnema"
        cp "data/${name}"/wav.scp "data/${name}_fnema/wav.scp"
        cp "data/${name}"/utt2spk "data/${name}_fnema/utt2spk" 2>/dev/null || true
        cp "data/${name}"/spk2utt "data/${name}_fnema/spk2utt" 2>/dev/null || true
        awk -v d="downloads/emadata/cin_us_mngu0/fnema" \
            '{printf "%s %s/%s.npy\n", $1, d, $1}' \
            "data/${name}/feats.scp" > "data/${name}_fnema/feats.scp"
    done
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
