"""Per-chip peak numbers for MFU / roofline denominators, keyed by
jax.devices()[0].device_kind. One table for every benchmark (the same
values used to live copy-pasted in train_throughput/trace_train/
roofline_decode and could drift apart)."""

PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,  # v6e / Trillium
}

HBM_BYTES_PER_S = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 0.819e12,  # v5e: 819 GB/s
    "TPU v5": 2.765e12,
    "TPU v6 lite": 1.64e12,
}
