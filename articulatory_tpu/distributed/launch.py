#!/usr/bin/env python3
"""Multi-process launcher (reference: articulatory/distributed/launch.py).

The reference spawns one process per GPU and wires NCCL env vars
(MASTER_ADDR/PORT, WORLD_SIZE, RANK). The TPU-native equivalent launches one
process per *host* and passes the ``jax.distributed`` rendezvous via env
vars consumed by bin/train.py (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID). On a real TPU pod each host launches its own process (e.g.
via the platform's per-host runner) and this module is used with
``--node_rank``; for local testing ``--nproc_per_node N`` spawns N processes
against a CPU mesh.

Usage (mirrors the reference CLI):
    python -m articulatory_tpu.distributed.launch --nproc_per_node 4 \
        [--nnodes 1 --node_rank 0 --master_addr 127.0.0.1 --master_port 29500] \
        [-c] training_script args...
"""

from __future__ import annotations

import os
import subprocess
import sys
from argparse import REMAINDER, ArgumentParser


def parse_args():
    parser = ArgumentParser(description="TPU-native distributed launcher")
    parser.add_argument("--nnodes", type=int, default=1)
    parser.add_argument("--node_rank", type=int, default=0)
    parser.add_argument("--nproc_per_node", type=int, default=1)
    parser.add_argument("--master_addr", default="127.0.0.1", type=str)
    parser.add_argument("--master_port", default=29500, type=int)
    parser.add_argument("-c", "--command", default=False, action="store_true",
                        help="run as a shell command instead of a python script")
    parser.add_argument("training_script", type=str)
    parser.add_argument("training_script_args", nargs=REMAINDER)
    return parser.parse_args()


def _die_with_parent():
    """preexec_fn: deliver SIGKILL to the rank when the launcher dies (even
    by SIGKILL, e.g. a test-harness timeout). Without it a killed launcher
    leaves ranks blocked forever in a collective whose peer is gone — and
    the Trainer's SIGTERM preemption handler makes them unkillable by a
    plain terminate (it waits to finish a step that can never finish)."""
    try:
        import ctypes
        import signal

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.prctl(1, signal.SIGKILL)  # PR_SET_PDEATHSIG = 1
    except Exception:
        pass


def main():
    args = parse_args()
    world_size = args.nnodes * args.nproc_per_node

    processes = []
    for local_rank in range(args.nproc_per_node):
        rank = args.nproc_per_node * args.node_rank + local_rank
        env = os.environ.copy()
        env["JAX_COORDINATOR_ADDRESS"] = f"{args.master_addr}:{args.master_port}"
        env["JAX_NUM_PROCESSES"] = str(world_size)
        env["JAX_PROCESS_ID"] = str(rank)
        # guard against cpu-thread oversubscription (reference launch.py:120-131)
        env.setdefault("OMP_NUM_THREADS", "1")
        if args.command:
            cmd = [args.training_script] + args.training_script_args
        else:
            cmd = [sys.executable, "-u", args.training_script,
                   *args.training_script_args]
        processes.append(subprocess.Popen(
            cmd, env=env,
            preexec_fn=_die_with_parent if sys.platform == "linux" else None))

    # poll ALL ranks; on the first failure terminate the survivors instead of
    # leaving them blocked in a collective forever (torch launcher parity)
    import time as _time

    failure = None
    while failure is None:
        running = False
        for p in processes:
            rc = p.poll()
            if rc is None:
                running = True
            elif rc != 0:
                failure = (rc, p.args)
                break
        if not running and failure is None:
            break  # all exited cleanly
        _time.sleep(0.5)
    if failure is not None:
        for p in processes:
            if p.poll() is None:
                p.terminate()
        deadline = _time.time() + 10
        for p in processes:
            try:
                p.wait(timeout=max(0.1, deadline - _time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
        code, cmd = failure
        raise subprocess.CalledProcessError(returncode=code, cmd=cmd)


if __name__ == "__main__":
    main()
