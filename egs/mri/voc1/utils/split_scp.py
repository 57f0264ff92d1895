#!/usr/bin/env python3
"""Split an scp file into N shards (replacement for Kaldi split_scp.pl).

Usage: split_scp.py in.scp out.1.scp out.2.scp ...
"""

import sys


def main():
    src = sys.argv[1]
    outs = sys.argv[2:]
    with open(src) as f:
        lines = [l for l in f if l.strip()]
    n = len(outs)
    for i, path in enumerate(outs):
        with open(path, "w") as f:
            # contiguous split, sizes differing by at most 1 (kaldi-style)
            per = len(lines) // n
            extra = len(lines) % n
            start = i * per + min(i, extra)
            end = start + per + (1 if i < extra else 0)
            f.writelines(lines[start:end])


if __name__ == "__main__":
    main()
