"""bench.py --mesh_data: the DP bench path compiles and executes over the
virtual 8-device mesh with the expected shardings (VERDICT r2 'do this' #5 —
no throughput claims on CPU, just the program contract)."""

import json
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P


@pytest.mark.slow  # ~40 s 8-device compile on the 1-core box
def test_bench_mesh_data_8(capsys, monkeypatch):
    assert jax.device_count() >= 8
    import bench

    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--smoke", "--mesh_data", "8", "--steps", "2", "--warmup", "1"],
    )
    bench.main()
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "train_throughput_contextual_extraction"
    assert rec["value"] > 0
    assert "DP x8 (global batch 16)" in rec["unit"]


def test_shard_batch_spec_over_data_axis():
    """The bench shards its batch exactly like the trainers: every array
    split on the 'data' mesh axis along dim 0."""
    from cse_tpu.core.mesh import make_mesh, shard_batch

    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(0)
    batch = {
        "mixed": jax.numpy.asarray(rng.standard_normal((16, 64)).astype(np.float32)),
        "gt": jax.numpy.asarray(rng.standard_normal((16, 64)).astype(np.float32)),
        "ctx_feat": jax.numpy.asarray(rng.standard_normal((16, 1, 8)).astype(np.float32)),
    }
    sharded = shard_batch(batch, mesh)
    for k, v in sharded.items():
        spec = v.sharding.spec
        assert spec[0] == "data", (k, spec)
        # 8 distinct device shards, each holding 2 rows
        assert len(set(d for d in v.sharding.device_set)) == 8
