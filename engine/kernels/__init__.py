"""Pure-Python extraction kernels executed inside Arrow-batched UDFs."""
