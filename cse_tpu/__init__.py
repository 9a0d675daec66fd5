"""cse_tpu — a TPU-native framework for Contextual Speech Extraction.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
miraodasilva/contextual-speech-extraction (ICASSP 2025, arXiv 2503.08798):
extracting the next speaker's waveform from a 2-3 speaker mixture using the
textual dialog history, encoded by a frozen Llama-3-8B, as an implicit cue.

Subpackages
-----------
core      meshes/sharding, precision policy, RNG streams, configuration
ops       audio DSP + compute kernels (segmentation, attention, resampling,
          mixing, losses) — pure jnp with Pallas fast paths
models    Sepformer dual-path separator (+CSE variants), Llama-3, ECAPA-TDNN,
          Whisper
data      corpus indexing, host audio IO, tokenization, batch pipeline
train     optimizer/schedules/train loops, checkpointing
eval      streaming metrics (SI-SNR/SDR/improvements), evaluators
compat    PyTorch checkpoint importers for the released reference weights
native    C++ host runtime (audio decode, mixing, prefetch) via ctypes
"""

__version__ = "0.1.0"
