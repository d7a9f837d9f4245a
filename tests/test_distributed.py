"""2-process jax.distributed rehearsal (VERDICT r4 missing #3 / weak #5).

Real pods are unreachable from this environment, so the multi-host startup
path (``init_distributed`` → ``jax.distributed.initialize``) is proven on
localhost: two CPU processes, a coordinator on a local port, each process
asserting process_count()==2 and computing a psum over a global mesh that
spans both processes. This is the same wiring a TPU pod run uses
(SURVEY §2.8); only the device fabric differs.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pbrt_tpu.parallel.shard import init_distributed

rank = int(sys.argv[1])
pid, count = init_distributed(
    coordinator=sys.argv[2], num_processes=2, process_id=rank
)
assert pid == rank and count == 2, (pid, count)

# a collective across BOTH processes' devices: global psum over the
# process-spanning mesh (each process contributes its local devices)
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

devs = jax.devices()  # global device list: 4 = 2 procs x 2 local
assert len(devs) == 4, devs
import numpy as np
mesh = Mesh(np.asarray(devs), ("d",))
f = shard_map(
    lambda x: jax.lax.psum(x, "d"), mesh=mesh,
    in_specs=P("d"), out_specs=P(),
)
import jax.random  # noqa
x = jnp.arange(4.0)
with mesh:
    from jax.experimental import multihost_utils
    y = jax.jit(f)(x)
got = float(jax.device_get(y)[0] if hasattr(y, "__len__") else y)
assert got == 6.0, got
print(f"RANK{{rank}} OK count={{count}} psum={{got}}")
"""


def test_two_process_distributed_psum():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    code = WORKER.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(rank), coord],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{out[-2000:]}\n{err[-3000:]}"
        assert f"RANK{rank} OK count=2" in out, out
