"""Compute ops: attention dispatch, Pallas kernels, quantized matmul, RoPE."""
