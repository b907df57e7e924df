"""Two-process jax.distributed smoke test for parallel/multihost.py.

Launches TWO actual python processes that each call
``multihost.initialize`` against a local TCP coordinator, build a global
2-process x 2-local-CPU-device mesh, assemble a global batch from
host-local shards via ``shard_host_local_batch``, and run one jitted
data-parallel "train step" (grad of a mean loss — GSPMD inserts the
cross-process all-reduce).  This is the piece the virtual 8-device tests
cannot exercise: multi-CONTROLLER array assembly and collectives across
process boundaries (reference analog: torch.distributed.launch + DDP,
tools/dist_train.sh, apis/train.py:227-231).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)
import jax
import numpy as np
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["REPO_ROOT"])
from rcbevdet_tpu.parallel import multihost
from rcbevdet_tpu.parallel.mesh import (
    create_mesh, replicate, shard_host_local_batch)

rank = int(sys.argv[1])
ok = multihost.initialize(
    coordinator_address=os.environ["COORD"], num_processes=2,
    process_id=rank)
assert ok, "initialize returned False"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

mesh = create_mesh()
GLOBAL_BATCH = 8
start, size = multihost.host_local_slice(GLOBAL_BATCH)
assert size == 4 and start == rank * 4, (start, size)

# host-local shard: values encode the global row index so rank 0 can
# verify the assembled global array ordering through the loss
local = {
    "x": (np.arange(start, start + size, dtype=np.float32)[:, None]
          * np.ones((1, 3), np.float32)),
}
batch = shard_host_local_batch(mesh, local)
assert batch["x"].shape == (GLOBAL_BATCH, 3)

params = replicate(mesh, {"w": np.full((3,), 2.0, np.float32)})

@jax.jit
def step(params, batch):
    def loss_fn(p):
        return ((batch["x"] @ p["w"]) ** 2).mean()
    l, g = jax.value_and_grad(loss_fn)(params)
    return l, g

loss, grads = step(params, batch)
# mean over the GLOBAL batch of (6*i)^2 for i in 0..7
expected = float(np.mean((6.0 * np.arange(8)) ** 2))
got = float(jax.device_get(loss))
assert abs(got - expected) < 1e-3, (got, expected)
gw = np.asarray(jax.device_get(grads["w"]))
assert np.isfinite(gw).all()
print(f"RANK{rank}_OK loss={got}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(
        os.environ,
        COORD=f"127.0.0.1:{_free_port()}",
        REPO_ROOT=repo,
        JAX_PLATFORMS="cpu",
    )
    # the worker sets its own XLA_FLAGS; drop any inherited device count
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
        assert f"RANK{r}_OK" in out, out[-3000:]
