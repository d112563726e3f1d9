"""Two-process jax.distributed smoke test (VERDICT round-2 item 7).

The reference exercises its multi-process path with real 2-GPU jobs
(dev/run_instant_tests.sh); here we launch two REAL OS processes on CPU,
rendezvous through engine/launch.py's jax.distributed branch, and run one
cross-process allgather plus one data-parallel-sharded train step. This is the
only test where launch.py's multi-host code actually executes.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.getcwd())

    from vnext_tpu.engine.launch import launch

    def main(tag):
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        assert jax.process_count() == 2, jax.process_count()
        rank = jax.process_index()

        # 1. cross-process allgather of per-rank scalars (comm.all_gather parity)
        gathered = multihost_utils.process_allgather(np.asarray([rank + 1.0]))
        assert sorted(gathered.ravel().tolist()) == [1.0, 2.0], gathered

        # 2. one data-parallel-sharded step: global batch 4 over 2 processes
        mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
        w = jnp.ones((8, 8))
        xs_local = jnp.full((2, 8), rank + 1.0)   # each process feeds its shard
        from jax.experimental import multihost_utils as mh
        x = mh.host_local_array_to_global_array(xs_local, mesh, P("data"))

        @jax.jit
        def step(w, x):
            y = x @ w
            loss = jnp.mean(y ** 2)
            g = jax.grad(lambda w: jnp.mean((x @ w) ** 2))(w)
            return loss, w - 0.1 * g

        with mesh:
            loss, w2 = step(w, x)
        # loss mixes both processes' shards: mean of (8*1)^2 and (8*2)^2 = 160
        np.testing.assert_allclose(float(loss), 160.0, rtol=1e-5)
        print(f"OK rank={rank} loss={float(loss)}", flush=True)

    port = os.environ["COORD_PORT"]
    rank = int(os.environ["RANK"])
    launch(
        main,
        num_machines=2,
        machine_rank=rank,
        dist_url=f"tcp://127.0.0.1:{port}",
        args=("smoke",),
    )
    """
)


def test_two_process_distributed_launch(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(
        os.environ,
        COORD_PORT=str(port),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    procs = []
    for rank in range(2):
        e = dict(env, RANK=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=e,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank}" in out, out
