"""Job-launcher backend selection (reference cmd.sh:31-92, run.pl family).

Pure command-construction tests — no scheduler needed. Plus an executed
local-backend smoke test (the default path run.sh actually uses).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the recipe files are thin shims over the shared package module
RUN_JOBS = os.path.join(ROOT, "egs", "ema", "voc1", "utils", "run_jobs.py")


def _load():
    from articulatory_tpu.utils import run_jobs
    return run_jobs


def test_ema_and_mri_shims_identical():
    mri = os.path.join(ROOT, "egs", "mri", "voc1", "utils", "run_jobs.py")
    assert open(RUN_JOBS).read() == open(mri).read()
    # and both are shims over the one shared implementation
    assert "articulatory_tpu.utils.run_jobs" in open(RUN_JOBS).read()


def test_parse_args_array_and_options():
    rj = _load()
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "slurm", "--mem", "4G", "--time", "12:00:00",
         "--num-threads", "2", "--gpu", "1", "--max-jobs-run", "5",
         "JOB=1:10", "log/x.JOB.log", "echo", "JOB"])
    assert (opts.backend, lo, hi) == ("slurm", 1, 10)
    assert logpat == "log/x.JOB.log" and cmd == ["echo", "JOB"]
    assert (opts.mem, opts.time, opts.num_threads, opts.gpu,
            opts.max_jobs_run) == ("4G", "12:00:00", 2, 1, 5)


def test_options_after_positional_belong_to_the_job():
    """run.pl parity: scheduler flags are only recognized BEFORE the JOB
    spec; ``--gpu``/``--time`` etc. after it belong to the wrapped command
    (regression: parse_known_args used to steal them)."""
    rj = _load()
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["JOB=1:2", "log/x.JOB.log",
         "python", "train.py", "--gpu", "2", "--time", "10:00"])
    assert (lo, hi, logpat) == (1, 2, "log/x.JOB.log")
    assert cmd == ["python", "train.py", "--gpu", "2", "--time", "10:00"]
    assert opts.gpu is None and opts.time is None


def test_array_script_job_expands_inside_quoted_args(tmp_path):
    """JOB inside an argument that shlex must quote still expands to the
    scheduler task id (regression: quote-then-replace buried the variable
    reference inside single quotes)."""
    rj = _load()
    script = rj._array_script(
        ["python3", "-c", "print('job JOB ok')"], "SLURM_ARRAY_TASK_ID")
    path = tmp_path / "array.sh"
    path.write_text(script)
    out = subprocess.run(
        ["bash", str(path)], capture_output=True, text=True,
        env={**os.environ, "SLURM_ARRAY_TASK_ID": "7"})
    assert out.returncode == 0 and out.stdout.strip() == "job 7 ok"


def test_backend_env_var_default(monkeypatch):
    rj = _load()
    monkeypatch.setenv("RUN_JOBS_BACKEND", "sge")
    opts, *_ = rj.parse_args(["JOB=1:2", "log/x.JOB.log", "true"])
    assert opts.backend == "sge"
    opts, *_ = rj.parse_args(["--backend", "local",
                              "JOB=1:2", "log/x.JOB.log", "true"])
    assert opts.backend == "local"  # explicit flag beats env


def test_slurm_submission_construction():
    rj = _load()
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "slurm", "--mem", "4G", "--num-threads", "2",
         "--gpu", "1", "--max-jobs-run", "4", "--time", "01:00:00",
         "JOB=1:8", "log/pre.JOB.log",
         "python3", "-m", "articulatory_tpu.bin.preprocess",
         "--wav-scp", "dump/wav.JOB.scp"])
    argv, script = rj.build_submission("slurm", lo, hi, logpat, cmd, opts)
    assert argv[0] == "sbatch"
    assert "--wait" in argv
    assert "--array=1-8%4" in argv
    assert argv[argv.index("-o") + 1] == "log/pre.%a.log"
    assert "--mem=4G" in argv and "--time=01:00:00" in argv
    assert "--cpus-per-task=2" in argv and "--gres=gpu:1" in argv
    assert argv[-1] == "__SCRIPT__"
    # the script substitutes the scheduler task id for every JOB token
    assert '"${SLURM_ARRAY_TASK_ID}"' in script
    assert "dump/wav." in script and "JOB" not in script.replace(
        "SLURM_ARRAY_TASK_ID", "")


def test_sge_submission_construction():
    rj = _load()
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "sge", "--mem", "2G", "--max-jobs-run", "3",
         "JOB=2:6", "log/n.JOB.log", "echo", "JOB"])
    argv, script = rj.build_submission("sge", lo, hi, logpat, cmd, opts)
    assert argv[0] == "qsub"
    assert argv[argv.index("-sync") + 1] == "y"  # blocks like run.pl
    assert argv[argv.index("-t") + 1] == "2-6"
    assert argv[argv.index("-o") + 1] == "log/n.$TASK_ID.log"
    assert "-tc" in argv and argv[argv.index("-tc") + 1] == "3"
    assert "mem_free=2G,ram_free=2G" in argv
    assert '"${SGE_TASK_ID}"' in script
    assert argv[-1] == "__SCRIPT__"


def test_unknown_backend_raises():
    rj = _load()
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["JOB=1:2", "log/x.JOB.log", "true"])
    with pytest.raises(ValueError):
        rj.build_submission("local", lo, hi, logpat, cmd, opts)


def test_local_backend_executes(tmp_path):
    logpat = str(tmp_path / "job.JOB.log")
    rc = subprocess.call(
        [sys.executable, RUN_JOBS, "JOB=1:3", logpat,
         "python3", "-c", "print('job JOB ok')"])
    assert rc == 0
    for j in (1, 2, 3):
        assert f"job {j} ok" in open(str(tmp_path / f"job.{j}.log")).read()


def test_local_backend_failure_propagates(tmp_path):
    logpat = str(tmp_path / "f.JOB.log")
    rc = subprocess.call(
        [sys.executable, RUN_JOBS, "JOB=1:2", logpat,
         "python3", "-c", "import sys; sys.exit(0 if 'JOB'=='1' else 1)"])
    assert rc != 0


def test_parse_args_usage_errors():
    """Missing positionals are a usage error, not a bare IndexError
    (regression: an all-options argv crashed with a traceback)."""
    rj = _load()
    for argv in ([], ["--backend", "slurm"], ["JOB=1:2"],
                 ["JOB=1:2", "log/x.JOB.log"], ["log/x.log"]):
        with pytest.raises(SystemExit):
            rj.parse_args(argv)


def test_empty_arg_preserved_in_array_script(tmp_path):
    """An empty-string argument survives into the batch script's argv
    (regression: it was dropped, shifting the wrapped command's flags)."""
    rj = _load()
    script = rj._array_script(
        ["python3", "-c", "import sys; print(repr(sys.argv[1:]))",
         "--tag", "", "JOB"], "SLURM_ARRAY_TASK_ID")
    path = tmp_path / "s.sh"
    path.write_text(script)
    out = subprocess.run(
        ["bash", str(path)], capture_output=True, text=True,
        env={**os.environ, "SLURM_ARRAY_TASK_ID": "7"})
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "['--tag', '', '7']"


def test_local_max_jobs_run_caps_concurrency(tmp_path):
    """run.pl parity: --max-jobs-run bounds local concurrency. Each job
    fails if it observes another job's lock file — with a working cap of 1
    the jobs serialize and all succeed."""
    rj = _load()
    locks = tmp_path / "locks"
    locks.mkdir()
    logpat = str(tmp_path / "c.JOB.log")
    cmd = ["bash", "-c",
           f'test -z "$(ls -A {locks})" || exit 1; '
           f'touch {locks}/l.JOB; sleep 0.1; rm {locks}/l.JOB']
    failed = rj._run_local(1, 3, logpat, cmd, max_jobs_run=1)
    assert failed == []


def test_batch_backend_creates_per_task_log_dirs(tmp_path, monkeypatch):
    """Array submission pre-creates the log directory of EVERY task when
    JOB names a directory component (regression: only task 1's dir)."""
    rj = _load()
    captured = {}

    def fake_call(argv):
        captured["argv"] = argv
        return 0

    monkeypatch.setattr(rj.subprocess, "call", fake_call)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        rj.sys, "argv",
        ["run_jobs.py", "--backend", "slurm", "JOB=1:3",
         "log/JOB/out.log", "true"])
    rj.main()
    for j in (1, 2, 3):
        assert (tmp_path / "log" / str(j)).is_dir()
    assert captured["argv"][0] == "sbatch"


def test_queue_conf_parse_and_expand():
    """queue.pl config schema: command + option rules + defaults."""
    rj = _load()
    conf = rj.QueueConf.parse("""
# comment
command sbatch --export=PATH --ntasks-per-node=1
option time=* --time $0
option mem=* --mem-per-cpu $0
option mem=0
option num_threads=* --cpus-per-task $0 --ntasks-per-node=1
default gpu=0
option gpu=0 -p cpu
option gpu=* -p gpu --gres=gpu:$0
""")
    assert conf.command == ["sbatch", "--export=PATH", "--ntasks-per-node=1"]
    # wildcard rule with $0 substitution
    assert conf.expand({"mem": "4G"}) == ["--mem-per-cpu", "4G", "-p", "cpu"]
    # exact-value override beats wildcard; empty args emit nothing
    assert conf.expand({"mem": "0", "gpu": None}) == ["-p", "cpu"]
    # default applies when unset; explicit value uses wildcard
    assert conf.expand({"gpu": 2}) == ["-p", "gpu", "--gres=gpu:2"]
    # unknown option with a value errors (queue.pl behavior)
    with pytest.raises(ValueError):
        conf.expand({"nope": "1"})
    with pytest.raises(ValueError):
        rj.QueueConf.parse("option mem=* --mem $0")  # no command line


def test_slurm_submission_with_config(tmp_path):
    """--config conf/slurm.conf replaces the base command and maps options;
    structural flags (--wait, --array, -o/-e) stay backend-determined."""
    rj = _load()
    conf = tmp_path / "slurm.conf"
    conf.write_text(
        "command sbatch --export=PATH --ntasks-per-node=1\n"
        "option mem=* --mem-per-cpu $0\n"
        "option time=* --time $0\n"
        "default gpu=0\n"
        "option gpu=0 -p cpu\n"
        "option gpu=* -p gpu --gres=gpu:$0\n")
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "slurm", "--config", str(conf), "--mem", "2G",
         "--max-jobs-run", "4", "JOB=1:8", "log/x.JOB.log", "echo", "JOB"])
    argv, script = rj.build_submission("slurm", lo, hi, logpat, cmd, opts)
    assert argv[:3] == ["sbatch", "--export=PATH", "--ntasks-per-node=1"]
    assert "--mem-per-cpu" in argv and "2G" in argv
    assert "-p" in argv and "cpu" in argv          # default gpu=0 rule
    assert "--wait" in argv and "--array=1-8%4" in argv
    assert "-o" in argv and "log/x.%a.log" in argv
    assert argv[-1] == "__SCRIPT__"
    assert "SLURM_ARRAY_TASK_ID" in script


def test_sge_submission_with_config(tmp_path):
    rj = _load()
    conf = tmp_path / "queue.conf"
    conf.write_text(
        "command qsub -V\n"
        "option mem=* -l mem_free=$0\n")
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "sge", "--config", str(conf), "--mem", "8G",
         "JOB=1:3", "log/y.JOB.log", "echo", "JOB"])
    argv, script = rj.build_submission("sge", lo, hi, logpat, cmd, opts)
    assert argv[:2] == ["qsub", "-V"]
    assert "-l" in argv and "mem_free=8G" in argv
    assert "-t" in argv and "1-3" in argv
    assert "SGE_TASK_ID" in script


def test_sge_config_keeps_structural_flags(tmp_path):
    """The --config sge path carries the same structural flags as the
    default path (regression: it dropped -j y / -b n, sending task stderr
    to SGE's default .e files instead of the per-task log)."""
    rj = _load()
    conf = tmp_path / "queue.conf"
    conf.write_text("command qsub -V\n")
    opts, lo, hi, logpat, cmd = rj.parse_args(
        ["--backend", "sge", "--config", str(conf), "--max-jobs-run", "2",
         "JOB=1:3", "log/y.JOB.log", "echo", "JOB"])
    argv_conf, _ = rj.build_submission("sge", lo, hi, logpat, cmd, opts)
    opts.config = None
    argv_plain, _ = rj.build_submission("sge", lo, hi, logpat, cmd, opts)
    # identical structural tail: -cwd -sync y -b n -j y -t ... -o ... -tc
    assert argv_conf[2:] == argv_plain[1:]
    for flag in ("-j", "-b", "-sync", "-cwd", "-tc"):
        assert flag in argv_conf


def test_array_script_recreates_environment(tmp_path, monkeypatch):
    """slurm.pl parity (reference utils/slurm.pl:373-386): the queue script
    cds to the submit cwd, re-exports PATH/PYTHONPATH, and sources
    ./path.sh — so conf command lines like ``sbatch --export=PATH``
    (reference conf/slurm.conf:2) cannot strip the package off
    PYTHONPATH in array tasks."""
    rj = _load()
    monkeypatch.chdir(tmp_path)
    (tmp_path / "path.sh").write_text("export FROM_PATH_SH=yes\n")
    monkeypatch.setenv("PYTHONPATH", "/some/pkg:/root/.axon_site")
    script = rj._array_script(
        ["bash", "-c", 'echo "$PWD|$PYTHONPATH|$FROM_PATH_SH|JOB"'],
        "SLURM_ARRAY_TASK_ID")
    path = tmp_path / "q.sh"
    path.write_text(script)
    out = subprocess.run(
        ["bash", str(path)], capture_output=True, text=True, cwd="/",
        env={"PATH": os.environ["PATH"],  # scheduler-style stripped env
             "SLURM_ARRAY_TASK_ID": "3"})
    assert out.returncode == 0, out.stderr
    pwd, pythonpath, from_path_sh, job = out.stdout.strip().split("|")
    assert pwd == str(tmp_path)
    assert pythonpath == "/some/pkg:/root/.axon_site"
    assert from_path_sh == "yes"
    assert job == "3"


def test_config_warns_on_local_backend(tmp_path):
    """--config with a non-scheduler backend is called out on stderr
    instead of being silently ignored."""
    conf = tmp_path / "slurm.conf"
    conf.write_text("command sbatch --export=PATH\n")
    logpat = str(tmp_path / "w.JOB.log")
    out = subprocess.run(
        [sys.executable, RUN_JOBS, "--backend", "local",
         "--config", str(conf), "JOB=1:1", logpat, "true"],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "no effect" in out.stderr


def test_shipped_slurm_conf_parses():
    """The recipes' conf/slurm.conf must parse and map the unified options."""
    rj = _load()
    for eg in ("ema", "mri"):
        path = os.path.join(ROOT, "egs", eg, "voc1", "conf", "slurm.conf")
        with open(path) as f:
            conf = rj.QueueConf.parse(f.read())
        args = conf.expand({"mem": "2G", "time": "12:00:00",
                            "num_threads": 2, "gpu": None})
        assert args == ["--mem-per-cpu", "2G", "--time", "12:00:00",
                        "--cpus-per-task", "2", "--ntasks-per-node=1",
                        "-p", "cpu"]
