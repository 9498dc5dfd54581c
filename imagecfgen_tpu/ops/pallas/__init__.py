from .fused_dense import fused_dense_lrelu
