from .native import native_available, baseline_residuals, block_matvec
