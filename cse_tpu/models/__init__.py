from cse_tpu.models.sepformer import (
    Sepformer,
    SepformerConfig,
    build_sepformer,
    sinusoidal_pe,
)

__all__ = ["Sepformer", "SepformerConfig", "build_sepformer", "sinusoidal_pe"]
