#!/usr/bin/env bash
# Fetch the released assets the cse_tpu real-weight validation suite
# (tests/test_real_assets.py, gated on CSE_ASSETS_DIR) consumes.
#
# Run this on a machine WITH network access; the build environment itself is
# zero-egress, which is why the suite skips until the layout below exists.
#
#   $CSE_ASSETS_DIR/
#     sepformer/*.ckpt       released CSE checkpoints (torch; any subset)
#     llama3-8b/             HF Meta-Llama-3-8B checkout (config.json,
#                            *.safetensors, tokenizer.json, ...)
#     ecapa/embedding_model.ckpt   speechbrain spkrec-ecapa-voxceleb
#     whisper/base.pt        OpenAI whisper base multilingual checkpoint
#     whisper/               (optional) HF WhisperTokenizer files for real
#                            text decode + tokenizer-derived suppression
#
# Sources (reference README.md:83-89 and :328-336):
#   - CSE checkpoints + premixed val/test sets: the Google Drive links in
#     /root/reference/README.md (Sepformer / ContSep / ContExt / H-ContExt
#     per corpus; val+test mixture archives per corpus). Use gdown:
#       gdown <file-id> -O "$CSE_ASSETS_DIR/sepformer/<name>.ckpt"
#   - Llama-3-8B (gated; accept the license first):
#       huggingface-cli download meta-llama/Meta-Llama-3-8B \
#         --local-dir "$CSE_ASSETS_DIR/llama3-8b"
#   - ECAPA:
#       huggingface-cli download speechbrain/spkrec-ecapa-voxceleb \
#         embedding_model.ckpt --local-dir "$CSE_ASSETS_DIR/ecapa"
#   - Whisper base (the checkpoint whisper.load_model("base") fetches):
#       curl -L -o "$CSE_ASSETS_DIR/whisper/base.pt" \
#         https://openaipublic.azureedge.net/main/whisper/models/ed3a0b6b1c0edf879ad9b11b1af5a0e6ab5db9205f891f668f8b0e6c6326e34e/base.pt
#       huggingface-cli download openai/whisper-base --local-dir \
#         "$CSE_ASSETS_DIR/whisper" --include 'tokenizer*' 'vocab*' \
#         'merges*' 'normalizer*' 'special_tokens*' 'added_tokens*'
#
# Then validate everything with one command:
#   CSE_ASSETS_DIR=/path/to/assets python -m pytest tests/test_real_assets.py -v
# (optionally CSE_DATA_DIR=<processed corpora root> to also run the
#  reference eval protocol end to end on DailyTalk 2-spk.)

set -euo pipefail
: "${CSE_ASSETS_DIR:?set CSE_ASSETS_DIR to the target directory}"
mkdir -p "$CSE_ASSETS_DIR"/{sepformer,llama3-8b,ecapa,whisper}
echo "Layout created under $CSE_ASSETS_DIR — fill it per the comments above."
