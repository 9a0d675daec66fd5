"""Train ContSep: unified separation + context-driven stream selection.

TPU-native equivalent of the reference ``train_ContSep.py`` (same flags):
PIT SI-SNR + weighted selector loss, frozen-LLM dialog-history conditioning,
data-parallel over the device mesh.

Example (reference recipe, ``README.md:104-150``):
  python train_ContSep.py --train_data dailytalk --augmentation --noise_add \\
      --warmup --tot_iters 300000 --lr 1.5e-4 --ctx_weight 5.0 --bf16
Smoke:
  python train_ContSep.py --synthetic_smoke --platform cpu --tot_iters 3 \\
      --batch_size 2 --eval_step 2 --max_sp_len 2
"""

from cse_tpu.core.flags import parse_train_args
from cse_tpu.train.loop import train_net

if __name__ == "__main__":
    train_net(parse_train_args(), variant="contsep")
