from cse_tpu.data import datasets
from cse_tpu.data.audio_io import read_wav, write_wav
from cse_tpu.data.pipeline import (
    EvalLoader,
    PipelineConfig,
    TrainLoader,
    prefetch,
    synthesize_batch,
)
from cse_tpu.data.tokenizer import ByteTokenizer, encode_batch, load_tokenizer

__all__ = [
    "datasets", "read_wav", "write_wav", "EvalLoader", "PipelineConfig",
    "TrainLoader", "prefetch", "synthesize_batch", "ByteTokenizer",
    "encode_batch", "load_tokenizer",
]
