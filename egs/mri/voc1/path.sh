# Environment setup (reference path.sh parity).
export PYTHONPATH="$(cd ../../.. && pwd):${PYTHONPATH:-}"
export OMP_NUM_THREADS=1
export MPL_BACKEND=Agg
