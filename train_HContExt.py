"""Train H-ContExt: extraction with joint dialog-history + speaker-voice cues.

TPU-native equivalent of the reference ``train_HContExt.py`` (same flags):
ContExt plus a frozen speaker-embedding cue with stochastic cue dropout
(joint 0.3 / history 0.35 / voice 0.35 per step).
"""

from cse_tpu.core.flags import parse_train_args
from cse_tpu.train.loop import train_net

if __name__ == "__main__":
    train_net(parse_train_args(), variant="hcontext")
