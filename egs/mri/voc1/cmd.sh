# Job-launcher backend selection (reference cmd.sh:31-92 parity).
# "local" runs shards as subprocesses on this host; "stdout" logs to stdout;
# "slurm" submits sbatch --wait --array jobs; "sge" submits qsub -sync y -t
# array jobs; "ssh" round-robins over hosts listed in .queue/machines.
# All five go through utils/run_jobs.py (the run.pl-family replacement),
# which maps the unified --mem/--time/--num-threads/--gpu/--max-jobs-run
# options onto each scheduler.
cmd_backend=local
# Optional queue.pl-style option-mapping config for slurm/sge (reference
# cmd.sh:58-60): set e.g. cmd_config=conf/slurm.conf with cmd_backend=slurm.
cmd_config=
export RUN_JOBS_BACKEND=${cmd_backend}
_cfg=${cmd_config:+--config ${cmd_config}}
train_cmd="python3 utils/run_jobs.py --backend ${cmd_backend} ${_cfg}"
cuda_cmd="python3 utils/run_jobs.py --backend ${cmd_backend} ${_cfg}"
decode_cmd="python3 utils/run_jobs.py --backend ${cmd_backend} ${_cfg}"
