"""Vectorized numpy kernels used inside pandas/Arrow UDFs — the
engine-internal analogue of the reference's CUDA device functions."""
