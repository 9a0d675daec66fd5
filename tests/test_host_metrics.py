"""Async host eval metrics: process-pool PESQ/SDR + mixture-side cache.

The protocol contract (reference ``test.py:155-310``): metric NUMBERS must be
identical whether host metrics run synchronously, on worker processes, or
restored from the prev cache — the pool/cache only move WHERE and WHEN the
work happens."""

import numpy as np
import pytest

from cse_tpu.eval.host_metrics import (
    HostMetricsPool,
    load_prev_cache,
    prev_cache_key,
    store_prev_cache,
)
from cse_tpu.eval.metrics import sdr_numpy
from cse_tpu.eval.pesq import pesq_nb

SR = 8000
rng = np.random.default_rng(0)


def _pair(n=SR * 2):
    g = rng.standard_normal(n)
    e = g + 0.1 * rng.standard_normal(n)
    return e, g


def test_sync_pool_matches_direct():
    pool = HostMetricsPool(sr=SR, workers=0)
    e1, g1 = _pair()
    e2, g2 = _pair()
    pool.submit_pesq("pesq", np.stack([e1, e2]), np.stack([g1, g2]))
    pool.submit_sdr("sdr", np.stack([e1, e2]), np.stack([g1, g2]))
    want_pesq = (pesq_nb(g1, e1) + pesq_nb(g2, e2)) / 2
    want_sdr = float(np.mean(sdr_numpy(np.stack([e1, e2]), np.stack([g1, g2]))))
    assert pool.mean("pesq") == pytest.approx(want_pesq, abs=1e-12)
    assert pool.mean("sdr") == pytest.approx(want_sdr, abs=1e-12)
    pool.close()


def test_process_pool_matches_sync():
    e, g = _pair()
    with HostMetricsPool(sr=SR, workers=2) as pool:
        pool.submit_pesq("pesq", e[None], g[None])
        pool.submit_sdr("sdr", e[None], g[None])
        got_pesq, got_sdr = pool.mean("pesq"), pool.mean("sdr")
    assert got_pesq == pytest.approx(pesq_nb(g, e), abs=1e-12)
    assert got_sdr == pytest.approx(float(sdr_numpy(e[None], g[None])[0]), abs=1e-12)


def test_pesq_lengths_trim_and_short_row_skip():
    pool = HostMetricsPool(sr=SR, workers=0)
    e, g = _pair()
    # row 0 valid to SR samples; row 1 too short to score (skipped)
    pool.submit_pesq("p", np.stack([e, e]), np.stack([g, g]), lengths=[SR, 16])
    total, count = pool.sums("p")
    assert count == 1
    assert total == pytest.approx(pesq_nb(g[:SR], e[:SR]), abs=1e-12)
    # nothing scored -> NaN, not 0.0
    assert np.isnan(pool.mean("empty"))
    pool.close()


class _FakeLoader:
    def __init__(self, mix_paths, gt_paths, t16=SR, B=2):
        self.mix_paths, self.gt_paths = mix_paths, gt_paths
        self.corpus, self.mode, self.B = "dailytalk", "test", B
        self.cfg = type("C", (), {"t16": t16})()

    def __len__(self):
        return len(self.mix_paths)


def test_prev_cache_key_tracks_row_set_and_limit():
    a = _FakeLoader(["m1", "m2", "m3", "m4"], ["g1", "g2", "g3", "g4"])
    b = _FakeLoader(["m1", "mX", "m3", "m4"], ["g1", "g2", "g3", "g4"])
    assert prev_cache_key(a, SR, None) != prev_cache_key(b, SR, None)
    assert prev_cache_key(a, SR, None) != prev_cache_key(a, SR, 1)  # fewer rows
    assert prev_cache_key(a, SR, None) == prev_cache_key(a, SR, 5)  # clamped
    assert prev_cache_key(a, 16000, None) != prev_cache_key(a, SR, None)


def test_prev_cache_roundtrip(tmp_path):
    key = "abc123"
    vals = {"si_snr_prev": 1.5, "sdr_prev": 2.5, "pesq_prev": 3.5, "n": 10}
    assert load_prev_cache(str(tmp_path), key) is None
    store_prev_cache(str(tmp_path), key, vals)
    got = load_prev_cache(str(tmp_path), key)
    assert {k: got[k] for k in vals} == vals
    assert load_prev_cache(str(tmp_path), "otherkey") is None
    assert load_prev_cache(None, key) is None  # disabled


def test_evaluate_prev_cache_skips_mixture_side(tmp_path, monkeypatch):
    """Second evaluate() run restores prev metrics from cache — identical
    results, zero mixture-side submissions."""
    from cse_tpu.eval import evaluator as ev

    B, T = 2, SR
    mixes = rng.standard_normal((2, B, T)).astype(np.float32)
    gts = (mixes + 0.05 * rng.standard_normal((2, B, T))).astype(np.float32)

    class Loader(_FakeLoader):
        def batches(self, limit_batches=None):
            for i in range(2):
                yield {
                    "mixed": mixes[i], "gt": gts[i],
                    "noises": rng.standard_normal((B, T, 1)).astype(np.float32),
                    "sp_len": np.full(B, T, np.int32),
                }

    loader = Loader([f"m{i}" for i in range(4)], [f"g{i}" for i in range(4)], B=B)

    def eval_step(params, batch):
        return batch["mixed"] * 0.9, {}

    kw = dict(sr=SR, verbose=False, metric_workers=0,
              prev_cache_dir=str(tmp_path))
    r1 = ev.evaluate(eval_step, None, loader, **kw)

    calls = {"prev": 0}
    orig = ev.HostMetricsPool.submit_pesq

    def spy(self, name, *a, **k):
        if name.endswith("_prev"):
            calls["prev"] += 1
        return orig(self, name, *a, **k)

    monkeypatch.setattr(ev.HostMetricsPool, "submit_pesq", spy)
    r2 = ev.evaluate(eval_step, None, loader, **kw)
    assert calls["prev"] == 0  # mixture side came from the cache
    for k in ("si_snr", "sdr", "si_snr_i", "sdr_i", "pesq", "pesq_i", "acc"):
        assert r1[k] == pytest.approx(r2[k], abs=1e-12), k
