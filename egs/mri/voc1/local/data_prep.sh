#!/usr/bin/env bash
# Generic data preparation: build wav.scp (with on-the-fly sox resampling
# when available) and split into train/dev/eval sets.
# Parity target: reference egs/*/voc1/local/data_prep.sh.

. ./path.sh 2>/dev/null || true

fs=20000
num_dev=5
num_eval=5
train_set="train_nodev"
dev_set="dev"
eval_set="eval"
shuffle=false

. utils/parse_options.sh 2>/dev/null || true

db_root=$1
spk=$2
data_dir=$3

if [ $# != 3 ]; then
    echo "Usage: $0 [--fs N] [--num_dev N] [--num_eval N] <db_root> <spk> <data_dir>" >&2
    exit 1
fi

set -euo pipefail

[ ! -e "${db_root}/${spk}" ] && echo "${spk} does not exist." >&2 && exit 1
mkdir -p "${data_dir}/all_${spk}"
scp="${data_dir}/all_${spk}/wav.scp"
rm -f "${scp}"

have_sox=0
command -v sox >/dev/null 2>&1 && have_sox=1

find "${db_root}/${spk}" -follow -name "*.wav" | sort | while read -r filename; do
    id=${spk}_$(basename "${filename}" | sed -e "s/\.[^\.]*$//g")
    if [ "${have_sox}" = "1" ]; then
        echo "${id} cat ${filename} | sox -t wav - -c 1 -b 16 -t wav - rate ${fs} |" >> "${scp}"
    else
        # plain path; resampling then happens in preprocess (scipy polyphase)
        echo "${id} ${filename}" >> "${scp}"
    fi
done

num_all=$(wc -l < "${scp}")
num_deveval=$((num_dev + num_eval))
num_train=$((num_all - num_deveval))

src="${scp}"
if [ "${shuffle}" = "true" ]; then
    src="${data_dir}/all_${spk}/wav.shuf.scp"
    shuf "${scp}" > "${src}"
fi

mkdir -p "${data_dir}/${train_set}" "${data_dir}/${dev_set}" "${data_dir}/${eval_set}"
head -n "${num_train}" "${src}" > "${data_dir}/${train_set}/wav.scp"
tail -n "${num_deveval}" "${src}" | head -n "${num_dev}" > "${data_dir}/${dev_set}/wav.scp"
tail -n "${num_eval}" "${src}" > "${data_dir}/${eval_set}/wav.scp"

echo "Successfully prepared data."
