"""Multi-host launcher integration: 2 processes rendezvous via
jax.distributed and run a cross-process collective on CPU."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]))
    import jax.numpy as jnp
    assert jax.process_count() == 2
    # global collective across the two single-device processes
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    local = np.ones((n_local,), np.float32) * (jax.process_index() + 1)
    x = jax.make_array_from_process_local_data(sharding, local, (n_global,))
    total = jax.jit(lambda v: jnp.sum(v))(x)
    expected = n_local * (1 + 2)  # procs contribute (pid+1) each over n_local
    assert float(total) == expected, (float(total), expected)
    print(f"proc {jax.process_index()} OK", flush=True)
""")


@pytest.mark.skipif(os.environ.get("SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_rendezvous(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    root = os.path.join(os.path.dirname(__file__), "..")
    env = os.environ.copy()
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "articulatory_tpu.distributed.launch",
         "--nproc_per_node", "2", "--master_port", "29731", str(worker)],
        env=env, capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stdout + proc.stderr
