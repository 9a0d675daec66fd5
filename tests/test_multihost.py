"""REAL multi-process jax.distributed validation (the torchrun replacement,
reference train_ContSep.py:114-132): two CPU processes rendezvous through
``distributed_init_if_needed``, run a cross-process collective, and shard the
train list per host — the code path a multi-host TPU slice exercises."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from cse_tpu.core.mesh import distributed_init_if_needed
distributed_init_if_needed()
distributed_init_if_needed()  # idempotent second call must be a no-op
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
from jax.experimental import multihost_utils
x = jnp.ones(4) * (jax.process_index() + 1)
s = multihost_utils.process_allgather(x)  # cross-process collective
assert float(s.sum()) == 12.0, s

# per-host data sharding keys off the REAL process index/count
from cse_tpu.data.pipeline import PipelineConfig, TrainLoader
from cse_tpu.data.tokenizer import ByteTokenizer
files = [f"f{i}.wav" for i in range(10)]
loader = TrainLoader(files, PipelineConfig(max_sp_len=1), ByteTokenizer(),
                     "dailytalk", batch_size=1)
idx = sorted(loader.epoch_indices(0))
print("SHARD", jax.process_index(), idx, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous_and_sharding():
    port = _free_port()
    base = dict(
        os.environ,
        COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    # children must NOT inherit the 8-device virtual-mesh flag conftest sets
    for env in (base,):
        env["XLA_FLAGS"] = ""
    procs = []
    for pid in range(2):
        env = dict(base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)

    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pi, idx = line.split(" ", 2)
                shards[int(pi)] = set(eval(idx))
    assert set(shards) == {0, 1}
    # DistributedSampler semantics: disjoint shards covering the corpus
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 10
