"""Multi-process (multi-host simulation) tests: 2 OS processes × N
virtual CPU devices each, gloo-backed collectives.

The reference never initializes distributed itself (it only detects
torch.distributed, ``utils/distributed.py:23-27``); SURVEY §2.4 sets the
TPU target higher — own the wiring and prove it in CI without pods.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from autoround_tpu.parallel import distributed as D
D.initialize(coordinator_address=f"127.0.0.1:{{port}}".format(port=port),
             num_processes=nproc, process_id=pid)
assert D.process_count() == nproc and D.process_index() == pid
assert jax.device_count() == 2 * nproc

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from autoround_tpu.parallel.dp import dp_grad_step

# barrier/agreement
total = D.sync_across_hosts(1.0)
assert total == jax.device_count(), total

# DP sign-grad equivalence: global batch split over 2 processes x 2 devices
mesh = D.global_mesh({{"dp": -1}})
rng = np.random.default_rng(0)
full_in = rng.standard_normal((8, 4)).astype(np.float32)
full_ref = rng.standard_normal((8, 2)).astype(np.float32)
w = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))

def loss_fn(params, xb, rb):
    pred = xb @ params["w"].T
    return jnp.mean((pred - rb) ** 2)

# this process's quarter of the batch (2 devices/proc, 2 samples/device)
lo = pid * 4
gin = D.host_local_to_global(mesh, P("dp"), full_in[lo: lo + 4])
gref = D.host_local_to_global(mesh, P("dp"), full_ref[lo: lo + 4])
step = dp_grad_step(loss_fn, mesh)
loss, grads = step({{"w": w}}, gin, gref)

# single-process reference on the full batch
ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
    {{"w": w}}, jnp.asarray(full_in), jnp.asarray(full_ref))
np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
np.testing.assert_allclose(np.asarray(jax.device_get(grads["w"])),
                           np.asarray(ref_grads["w"]), rtol=1e-5, atol=1e-6)
print(f"WORKER_OK {{pid}}".format(pid=pid), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestTwoProcessMesh:
    def test_psum_and_dp_grads_across_processes(self, tmp_path):
        worker = tmp_path / "worker.py"
        worker.write_text(_WORKER.format(repo=REPO))
        port = _free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(pid), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for pid in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=180)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
            assert f"WORKER_OK {pid}" in out
