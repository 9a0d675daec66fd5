from cse_tpu.eval.evaluator import evaluate
from cse_tpu.eval.metrics import SdrMetric, SiSnrMetric, sdr_numpy, si_snr_numpy

__all__ = ["evaluate", "SdrMetric", "SiSnrMetric", "sdr_numpy", "si_snr_numpy"]
