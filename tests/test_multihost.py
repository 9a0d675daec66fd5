"""REAL multi-process jax.distributed validation (the torchrun replacement,
reference train_ContSep.py:114-132): two CPU processes rendezvous through
``distributed_init_if_needed``, run a cross-process collective, and shard the
train list per host — the code path a multi-host TPU slice exercises."""

import pytest
import os
import socket
import subprocess
import sys
pytestmark = pytest.mark.slow  # multi-minute on the 1-core box; excluded by -m 'not slow'

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

# one REAL SPMD train step over the 2-process global mesh: host-local batch
# shards assemble into a global array (shard_batch's multi-host path) and
# gradients all-reduce across processes
import numpy as np
from cse_tpu.core.mesh import make_mesh, shard_batch
from cse_tpu.models import Sepformer, SepformerConfig
from cse_tpu.train.optimizer import build_optimizer
from cse_tpu.train.step import TrainConfig, make_train_step


mesh = make_mesh(n_data=2)  # 2 global devices, 1 per process
cfg = SepformerConfig(
    variant="context", enc_channels=8, enc_kernel=8, enc_stride=4, d_model=8,
    nhead=2, d_ffn=16, num_tf_layers=1, num_dp_layers=1, chunk_size=8,
    llm_dim=8, pe_max_len=128,
)
model = Sepformer(cfg)
rng = np.random.default_rng(jax.process_index())  # per-host data divergence
local = {
    "mixed": jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32)),
    "gt": jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32)),
    "ctx_feat": jnp.asarray(rng.standard_normal((1, 1, 8)).astype(np.float32)),
}
params = model.init(jax.random.key(0), local["mixed"], local["ctx_feat"])
tx = build_optimizer(1e-4)
opt_state = tx.init(params)
step = make_train_step(model, tx, TrainConfig(variant="context"), mesh=mesh)
gbatch = shard_batch(local, mesh)
assert gbatch["mixed"].shape[0] == 2, gbatch["mixed"].shape  # global batch
params, opt_state, metrics = step(params, opt_state, gbatch, jax.random.key(1))
loss = float(metrics["loss"])  # replicated: identical on both hosts
assert np.isfinite(loss)
print("STEP", jax.process_index(), round(loss, 6), flush=True)

# multi-host checkpoint contract (VERDICT r3 weak #3): rank-0 saves the
# replicated train state AFTER a step, all hosts barrier, BOTH restore, and
# the resumed step's loss must equal a non-checkpointed continuation's —
# save/restore across processes must be a pure no-op on training dynamics.
from jax.experimental import multihost_utils as mhu
from cse_tpu.train import checkpoint as ckpt_lib

ckdir = os.environ["CSE_TEST_CKPT_DIR"]
state = {"params": params, "opt_state": opt_state, "step": 1, "epoch": 0}
# host template captured BEFORE the donating continuation step invalidates
# the buffers (also gives restore its pytree structure)
template = jax.tree.map(np.asarray, state)
if jax.process_index() == 0:
    ckpt_lib.save_checkpoint(ckdir, 0, 1, 0.0, state)
mhu.sync_global_devices("ckpt saved")  # the pre-checkpoint barrier (:467)

# ground-truth continuation (donates params/opt_state)
_, _, m_ref = step(params, opt_state, gbatch, jax.random.key(2))
ref2 = float(m_ref["loss"])

path = ckpt_lib.latest_checkpoint(ckdir)
assert path is not None, ckdir
restored = ckpt_lib.restore_checkpoint(path, template=template)
assert int(np.asarray(restored["step"])) == 1
_, _, m_res = step(restored["params"], restored["opt_state"], gbatch,
                   jax.random.key(2))
res2 = float(m_res["loss"])
assert np.isfinite(res2)
print("CKPT", jax.process_index(), round(ref2, 9), round(res2, 9), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous_and_sharding(tmp_path):
    port = _free_port()
    base = dict(
        os.environ,
        COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        CSE_TEST_CKPT_DIR=str(tmp_path / "ckpts"),
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

    shards, losses, ckpt = {}, {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pi, idx = line.split(" ", 2)
                shards[int(pi)] = set(eval(idx))
            if line.startswith("STEP"):
                _, pi, loss = line.split()
                losses[int(pi)] = float(loss)
            if line.startswith("CKPT"):
                _, pi, ref2, res2 = line.split()
                ckpt[int(pi)] = (float(ref2), float(res2))
    assert set(shards) == {0, 1}
    # DistributedSampler semantics: disjoint shards covering the corpus
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == 10
    # the SPMD step's replicated loss must agree across hosts (each host fed
    # DIFFERENT local data, so agreement proves the cross-process reduction)
    assert set(losses) == {0, 1} and losses[0] == losses[1], losses
    # save -> barrier -> restore -> step must reproduce the non-checkpointed
    # continuation exactly, on BOTH processes
    assert set(ckpt) == {0, 1}, outs
    for pi, (ref2, res2) in ckpt.items():
        assert ref2 == res2, (pi, ckpt)
    assert ckpt[0] == ckpt[1], ckpt
