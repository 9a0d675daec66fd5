from cse_tpu.ops.segmentation import segment, overlap_add, segment_shapes
from cse_tpu.ops.losses import si_snr, neg_si_snr_loss, pit_si_snr_loss, sdr
from cse_tpu.ops.mixing import (
    peak_normalize,
    mix_2spk,
    mix_3spk,
    add_noise_snr,
    circular_shift,
)
from cse_tpu.ops.resample import resample, resample_poly_filter, speed_perturb

__all__ = [
    "segment",
    "overlap_add",
    "segment_shapes",
    "si_snr",
    "neg_si_snr_loss",
    "pit_si_snr_loss",
    "sdr",
    "peak_normalize",
    "mix_2spk",
    "mix_3spk",
    "add_noise_snr",
    "circular_shift",
    "resample",
    "resample_poly_filter",
    "speed_perturb",
]
