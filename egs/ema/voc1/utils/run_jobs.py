#!/usr/bin/env python3
"""Parallel array-job launcher — python replacement for Kaldi's run.pl.

Interface: ``run_jobs.py JOB=1:N log/xxx.JOB.log cmd --args JOB ...``
Each job runs with the literal token ``JOB`` substituted by its index; logs
go to the per-job log file. Exits nonzero if any job fails (mirrors
launch.py:156-159 / run.pl semantics).
"""

from __future__ import annotations

import re
import subprocess
import sys


def main():
    argv = sys.argv[1:]
    m = re.match(r"JOB=(\d+):(\d+)$", argv[0]) if argv else None
    if m:
        lo, hi = int(m.group(1)), int(m.group(2))
        logpat = argv[1]
        cmd = argv[2:]
    else:
        lo = hi = 1
        logpat = argv[0]
        cmd = argv[1:]

    procs = []
    for job in range(lo, hi + 1):
        jcmd = [c.replace("JOB", str(job)) for c in cmd]
        jlog = logpat.replace("JOB", str(job))
        import os

        os.makedirs(os.path.dirname(jlog) or ".", exist_ok=True)
        with open(jlog, "w") as logf:
            procs.append((job, subprocess.Popen(jcmd, stdout=logf,
                                                stderr=subprocess.STDOUT)))
    failed = []
    for job, p in procs:
        if p.wait() != 0:
            failed.append(job)
    if failed:
        print(f"run_jobs.py: jobs failed: {failed} (see {logpat})",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
