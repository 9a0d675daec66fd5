"""Data layer tests: audio IO roundtrip, corpus indexing/context semantics,
tokenization budgets, and the full host->device train/eval pipeline over a
synthetic corpus."""

import os

import numpy as np
import pytest

from cse_tpu.data import datasets as ds
from cse_tpu.data.audio_io import read_wav, write_wav
from cse_tpu.data.pipeline import EvalLoader, PipelineConfig, TrainLoader, prefetch
from cse_tpu.data.synthetic import make_synthetic_corpus
from cse_tpu.data.tokenizer import ByteTokenizer, encode_batch


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    info = make_synthetic_corpus(root, n_dialogs=3, turns_per_dialog=5, n_eval=5)
    return info


def test_wav_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 8000).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and len(y) == 8000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_text_process():
    assert ds.text_process("  hello [unk]   world  ") == "hello world"


def test_train_list_and_context(corpus):
    paths = ds.CorpusPaths(
        dailytalk=corpus["dailytalk_data_path"], lists_root=corpus["lists_root"]
    )
    files = ds.build_train_list(paths, "dailytalk")
    assert len(files) == 15  # 3 dialogs x 5 turns
    # first turn of a dialog: empty history -> only the next-speaker prompt
    ctx0 = ds.assemble_context(files[0], "dailytalk", "test", context_length=0)
    assert ctx0 == "Speaker 1: "
    ctx_last = ds.assemble_context(files[4], "dailytalk", "test", context_length=0)
    assert ctx_last.count("/n") == 4  # 4 history turns + prompt, '/n'-joined
    assert "Speaker 0: " in ctx_last and "\n" not in ctx_last
    ctx_none = ds.assemble_context(files[4], "dailytalk", "test", context_length=-1)
    assert ctx_none.count("/n") == 0
    ctx2 = ds.assemble_context(files[4], "dailytalk", "test", context_length=2)
    assert ctx2.count("/n") == 2


def test_eval_list(corpus):
    paths = ds.CorpusPaths(dailytalk=corpus["dailytalk_data_path"])
    mix, gt = ds.build_eval_list(paths, "dailytalk", "test")
    assert len(mix) == 5 and len(gt) == 5
    assert all("/mixed/" in m for m in mix) and all("/gt/" in g for g in gt)
    assert ds.noise_paths_for(gt[0], 2)[0].count("/noise/") == 1


def test_tokenizer_budget():
    tok = ByteTokenizer()
    ids, mask = encode_batch(tok, ["hi", "a much longer context string"], 8)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert mask[0].sum() == 3  # bos + 2 bytes, left-padded
    assert mask[1].sum() == 8  # left-truncated to budget
    assert ids[0, :5].tolist() == [0] * 5  # pad on the left


def test_tokenizer_ctx_buckets():
    tok = ByteTokenizer()
    # longest row = 29 bytes + bos = 30 tokens -> 32 bucket
    ids, mask = encode_batch(
        tok, ["hi", "a much longer context string!"], 512,
        buckets=(32, 128, 512),
    )
    assert ids.shape == (2, 32) and mask.shape == (2, 32)
    assert mask[1].sum() == 30
    # nothing fits -> cap at max_tokens
    ids, mask = encode_batch(tok, ["x" * 600], 512, buckets=(32, 128))
    assert ids.shape == (1, 512) and mask[0].sum() == 512
    # bucket width larger than max_tokens is capped too
    ids, _ = encode_batch(tok, ["x" * 600], 64, buckets=(128,))
    assert ids.shape == (1, 64)


def test_ctx_bucket_features_invariant_to_pad_width():
    """Left-pad width must not change the context feature (mask-respecting
    encoders); bucketing would otherwise alter training vs the fixed budget."""
    import numpy as np

    from cse_tpu.models.context_encoder import HashProjectionEncoder

    tok = ByteTokenizer()
    enc = HashProjectionEncoder(dim=32, ctx_length=1)
    texts = ["short context", "a somewhat longer dialog history line"]
    a = enc(*encode_batch(tok, texts, 512))
    b = enc(*encode_batch(tok, texts, 512, buckets=(64,)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_pipeline_end_to_end(corpus):
    paths = ds.CorpusPaths(
        dailytalk=corpus["dailytalk_data_path"], lists_root=corpus["lists_root"]
    )
    files = ds.build_train_list(paths, "dailytalk")
    cfg = PipelineConfig(max_sp_len=4, max_ctx_tokens=64)
    demand = ds.demand_noise_list(ds.CorpusPaths(demand=corpus["acoustic_noise_path"]))
    assert len(demand) == 2
    loader = TrainLoader(
        files, cfg, ByteTokenizer(), "dailytalk", batch_size=3,
        demand_files=demand, seed=0, num_workers=2,
        process_index=0, process_count=1,
    )
    n = 0
    for host in prefetch(loader.batches(epoch=0)):
        batch = loader.device_batch(host)
        assert batch["mixed"].shape == (3, 4 * 8000)
        assert batch["gt"].shape == (3, 4 * 8000)
        assert batch["noises"].shape == (3, 4 * 8000, 1)
        m = np.asarray(batch["mixed"])
        assert np.isfinite(m).all()
        # peak-normed to 0.9 pre-DEMAND; noise addition may push above it
        # (faithful: the reference doesn't renormalize after F.add_noise)
        peaks = np.abs(m).max(axis=-1)
        assert (peaks > 0.5).all() and (peaks < 2.0).all()
        lens = np.asarray(batch["sp_len"])
        assert (lens > 0).all() and (lens <= 4 * 8000).all()
        n += 1
        if n >= 2:
            break
    assert n == 2


def test_train_pipeline_deterministic(corpus):
    paths = ds.CorpusPaths(
        dailytalk=corpus["dailytalk_data_path"], lists_root=corpus["lists_root"]
    )
    files = ds.build_train_list(paths, "dailytalk")
    cfg = PipelineConfig(max_sp_len=2, noise_add=False, max_ctx_tokens=32)

    def first_batch():
        loader = TrainLoader(
            files, cfg, ByteTokenizer(), "dailytalk", batch_size=2, seed=7,
            num_workers=2, process_index=0, process_count=1,
        )
        return next(iter(loader.batches(epoch=0)))

    a, b = first_batch(), first_batch()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_host_sharding_disjoint(corpus):
    paths = ds.CorpusPaths(
        dailytalk=corpus["dailytalk_data_path"], lists_root=corpus["lists_root"]
    )
    files = ds.build_train_list(paths, "dailytalk")
    cfg = PipelineConfig(max_sp_len=2)
    shards = []
    for pi in range(2):
        loader = TrainLoader(
            files, cfg, ByteTokenizer(), "dailytalk", batch_size=2, seed=3,
            process_index=pi, process_count=2,
        )
        shards.append(set(loader.epoch_indices(0)))
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == len(files)


def test_eval_loader(corpus):
    paths = ds.CorpusPaths(dailytalk=corpus["dailytalk_data_path"])
    cfg = PipelineConfig(max_sp_len=4, max_ctx_tokens=64)
    loader = EvalLoader(
        paths, "dailytalk", "test", cfg, ByteTokenizer(), batch_size=2,
        num_workers=2,
    )
    batches = list(loader.batches())
    assert sum(b["mixed"].shape[0] for b in batches) == 5
    b0 = batches[0]
    assert b0["mixed"].shape[1] == 4 * 8000
    assert len(b0["names"]) == 2 and b0["names"][0].endswith("-mix")
    # gt must correlate with mixed (they share the source)
    m, g = np.asarray(b0["mixed"][0]), np.asarray(b0["gt"][0])
    n = int(b0["sp_len"][0])
    corr = np.corrcoef(m[:n], g[:n])[0, 1]
    assert corr > 0.3, corr


def test_prefetch_propagates_worker_errors():
    """A decode failure inside the prefetch thread must raise in the consumer,
    not silently end the epoch."""
    from cse_tpu.data.pipeline import prefetch

    def bad_iter():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch(bad_iter())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_prefetch_consumer_abort_releases_worker():
    """An aborted consumer (exception/close mid-loop) must release the
    producer thread — otherwise every failed eval in a long-lived process
    leaks a thread pinned on q.put plus depth+1 materialized batches."""
    import itertools
    import time

    from cse_tpu.data.pipeline import prefetch

    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()  # consumer aborts (same path as an exception in its loop)
    time.sleep(0.4)  # > the worker's 100 ms stop-poll
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n, "producer kept running after consumer abort"


def test_eval_loader_carries_16k_gt(corpus):
    """Eval batches keep a 16 kHz gt copy for ECAPA enrollment (the model-rate
    gt is 8 kHz; the speaker encoder consumes 16 kHz, reference :375-391)."""
    paths = ds.CorpusPaths(dailytalk=corpus["dailytalk_data_path"])
    cfg = PipelineConfig(max_sp_len=4, max_ctx_tokens=64)
    loader = EvalLoader(
        paths, "dailytalk", "test", cfg, ByteTokenizer(), batch_size=2,
        num_workers=2,
    )
    b0 = next(iter(loader.batches(limit_batches=1)))
    assert b0["gt16k"].shape[1] == 2 * b0["gt"].shape[1]
    # sp_len is ceil-scaled to the model rate, so allow odd-length slack
    assert abs(int(b0["gt16k_len"][0]) - 2 * int(b0["sp_len"][0])) <= 1


@pytest.mark.parametrize("num_test_mix", [2, 3])
def test_eval_loader_native_matches_python(monkeypatch, tmp_path, num_test_mix):
    """The C++ batch-decode eval path must be bit-identical to the Python
    per-row path (same raw decode, gt/noise trim-to-mix, resample chain) —
    for both the 1-interferer (2-spk) and 2-interferer (3-spk) layouts, and
    for a gt file LONGER than its mix (the direct-decode path must zero the
    over-extent it wrote past the trim point)."""
    from cse_tpu.data.audio_io import read_wav as _rw, write_wav as _ww
    from cse_tpu.native import audio_native

    if not audio_native.available():
        pytest.skip("native runtime not built")
    # private corpus (not the module fixture): this test doctors a gt file
    info = make_synthetic_corpus(
        str(tmp_path / "c"), n_dialogs=2, turns_per_dialog=4, n_eval=4,
        num_test_mix=num_test_mix,
    )
    paths = ds.CorpusPaths(dailytalk=info["dailytalk_data_path"])
    cfg = PipelineConfig(max_sp_len=4, max_ctx_tokens=64)

    def mk():
        return EvalLoader(
            paths, "dailytalk", "test", cfg, ByteTokenizer(), batch_size=2,
            num_workers=2, num_test_mix=num_test_mix,
        )

    # doctor one gt to be longer than its mix: the trim-to-mix rule applies
    probe = mk()
    gp = probe.gt_paths[0]
    g0, gsr = _rw(gp)
    _ww(gp, np.concatenate([g0, 0.25 * g0]), gsr)
    probe.close()

    nat = list(mk().batches())
    monkeypatch.setattr(audio_native, "available", lambda: False)
    py = list(mk().batches())
    assert len(nat) == len(py) > 0
    assert nat[0]["noises"].shape[-1] == num_test_mix - 1
    for a, b in zip(nat, py):
        for k in ("mixed", "gt", "noises", "sp_len", "gt16k", "gt16k_len",
                  "context_ids", "context_mask"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )
        assert a["names"] == b["names"] and a["contexts"] == b["contexts"]


@pytest.mark.parametrize("corpus", ["spokenwoz", "tedlium"])
def test_cross_corpus_layouts(tmp_path, corpus):
    """SpokenWoz/TEDLIUM-shaped corpora drive their distinct indexer and
    context-assembly rules (reference dataset_train_CSE.py:118-162,300-322)."""
    info = make_synthetic_corpus(
        str(tmp_path), n_dialogs=2, turns_per_dialog=4, n_eval=3, corpus=corpus
    )
    paths = ds.CorpusPaths(**{corpus: info[f"{corpus}_data_path"]})
    files = ds.build_train_list(paths, corpus)
    assert len(files) == 8
    ctx = ds.assemble_context(files[-1], corpus, "test", context_length=0)
    turns = ctx.split("/n")
    assert len(turns) >= 2
    if corpus == "tedlium":
        # no speaker prefixes; trailing prompt is empty
        assert not any(t.startswith("Speaker ") for t in turns)
        assert turns[-1] == ""
    else:
        assert all(t.startswith("Speaker ") for t in turns)
        assert turns[-1] in ("Speaker 0: ", "Speaker 1: ")

    mix, gt = ds.build_eval_list(paths, corpus, "test")
    assert len(mix) == 3 and all(os.path.exists(p) for p in mix + gt)
    if corpus == "tedlium":
        # enrollment register: a gt wav of the same speaker must resolve
        p = ds.enrollment_path(mix[0], corpus, "test", paths)
        assert p is not None and os.path.exists(p)


def test_truncated_wav_decodes_prefix(tmp_path, rng):
    """A WAV with a torn-off tail decodes its complete frames instead of
    crashing the loader (matches the native decoder's flooring)."""
    x = rng.uniform(-0.5, 0.5, 4000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[:-1])  # odd data size: not a multiple of the frame size
    from cse_tpu.data.audio_io import _read_wav_py

    y, sr = _read_wav_py(p)
    assert sr == 16000 and len(y) == 3999


def test_int16_wire_roundtrip(tmp_path, rng):
    """Waveform wire contract (pipeline.wire_int16/_unwire): exact for
    PCM16-decoded audio (decode divides by 32768 — audio_io.py:71 — and the
    wire re-scales by the same constant), <=3e-5 relative for arbitrary
    floats in [-1, 1]."""
    import jax.numpy as jnp

    from cse_tpu.data.audio_io import read_wav, write_wav
    from cse_tpu.data.pipeline import _unwire, wire_int16

    # arbitrary float audio: bounded quantization error
    x = rng.uniform(-1.0, 1.0, 8000).astype(np.float32)
    back = np.asarray(_unwire(jnp.asarray(wire_int16(x))))
    assert np.abs(back - x).max() <= (1.0 / 32768.0) + 1e-7

    # PCM16-decoded audio: bit-exact through the wire
    p = str(tmp_path / "w.wav")
    write_wav(p, x, 16000)
    d, sr = read_wav(p)
    back = np.asarray(_unwire(jnp.asarray(wire_int16(d))))
    np.testing.assert_array_equal(back, d)

    # float passthrough: _unwire is a no-op for non-int16 inputs
    f = jnp.asarray(x)
    assert _unwire(f) is f
