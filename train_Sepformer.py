"""Pretrain a plain Sepformer (no context): PIT SI-SNR separation.

The reference ships only pretrained Sepformer checkpoints (its CSE trainers
warm-start from them, reference ``README.md:92,120``) — this CLI provides the
missing pretraining stage on TPU so the full workflow is reproducible
end-to-end. Same flags as the other trainers; the context/LLM path is unused.
"""

from cse_tpu.core.flags import parse_train_args
from cse_tpu.train.loop import train_net

if __name__ == "__main__":
    train_net(parse_train_args(), variant="base")
