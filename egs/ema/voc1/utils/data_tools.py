#!/usr/bin/env python3
"""Kaldi-style data-dir tools: subset / combine (python replacements for
make_subset_data.sh and combine_data.sh).

Usage:
    data_tools.py subset <src_dir> <n_utts> <dst_dir>
    data_tools.py combine <dst_dir> <src_dir1> <src_dir2> ...
"""

from __future__ import annotations

import os
import sys

FILES = ("wav.scp", "feats.scp", "utt2spk", "ph.scp")


def _read(path):
    with open(path) as f:
        return [l for l in f if l.strip()]


def subset(src: str, n: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    keep = None
    for name in FILES:
        p = os.path.join(src, name)
        if not os.path.exists(p):
            continue
        lines = _read(p)
        if keep is None:
            keep = {l.split()[0] for l in lines[:n]}
        with open(os.path.join(dst, name), "w") as f:
            f.writelines(l for l in lines if l.split()[0] in keep)
    _rebuild_spk2utt(dst)


def combine(dst: str, srcs: list[str]) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in FILES:
        lines = []
        for src in srcs:
            p = os.path.join(src, name)
            if os.path.exists(p):
                lines.extend(_read(p))
        if lines:
            lines.sort(key=lambda l: l.split()[0])
            with open(os.path.join(dst, name), "w") as f:
                f.writelines(lines)
    _rebuild_spk2utt(dst)


def _rebuild_spk2utt(d: str) -> None:
    p = os.path.join(d, "utt2spk")
    if not os.path.exists(p):
        return
    spk2utt: dict[str, list[str]] = {}
    for line in _read(p):
        utt, spk = line.split()[:2]
        spk2utt.setdefault(spk, []).append(utt)
    with open(os.path.join(d, "spk2utt"), "w") as f:
        for spk in sorted(spk2utt):
            f.write(f"{spk} {' '.join(sorted(spk2utt[spk]))}\n")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "subset":
        subset(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    elif cmd == "combine":
        combine(sys.argv[2], sys.argv[3:])
    else:
        sys.exit(__doc__)
