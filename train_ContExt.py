"""Train ContExt: direct context-conditioned target-speech extraction.

TPU-native equivalent of the reference ``train_ContExt.py`` (same flags):
-SI-SNR objective on the single extracted stream, frozen-LLM conditioning
via prompt tokens in every dual-path block.
"""

from cse_tpu.core.flags import parse_train_args
from cse_tpu.train.loop import train_net

if __name__ == "__main__":
    train_net(parse_train_args(), variant="context")
