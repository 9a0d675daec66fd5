from cse_tpu.core import flags, mesh

__all__ = ["flags", "mesh"]
