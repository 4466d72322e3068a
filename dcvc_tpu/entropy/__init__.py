from .bit_estimator import BitEstimator, bit_estimator_z_prob, bit_estimator_z_fwd
from .gaussian import (
    GaussianConditional, SCALE_MIN, SCALE_MAX, SCALE_LEVEL,
    get_scale_table, scale_to_index, gaussian_prob_train, probs_to_bits,
)
from .cdf import (
    pmf_to_quantized_cdf, reorder_prob, pmf_to_cdf,
    build_z_cdf_bank, build_y_cdf_bank, MAX_ENTROPY_CODING_VALUE,
)

__all__ = [
    "BitEstimator", "bit_estimator_z_prob", "bit_estimator_z_fwd",
    "GaussianConditional", "SCALE_MIN", "SCALE_MAX", "SCALE_LEVEL",
    "get_scale_table", "scale_to_index", "gaussian_prob_train", "probs_to_bits",
    "pmf_to_quantized_cdf", "reorder_prob", "pmf_to_cdf",
    "build_z_cdf_bank", "build_y_cdf_bank", "MAX_ENTROPY_CODING_VALUE",
]
