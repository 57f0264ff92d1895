# Job-launcher backend selection (reference cmd.sh parity).
# "local" runs shards with utils/run_jobs.py on this host; point train_cmd at
# your scheduler wrapper (slurm: srun, sge: qsub wrapper) for cluster runs.
backend=local
train_cmd="python3 utils/run_jobs.py"
cuda_cmd="python3 utils/run_jobs.py"
decode_cmd="python3 utils/run_jobs.py"
