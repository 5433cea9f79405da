"""Adjustment options (the analogue of the reference's project_settings.a).

Defaults parity: include/config/dnaoptions.hpp:430-432 (max_iterations 10,
threshold 0.0005 m, confidence 95%, free SD 10 m, fixed SD 1e-6 m).
"""

from dataclasses import dataclass


@dataclass
class AdjustmentOptions:
    max_iterations: int = 10
    iteration_threshold: float = 0.0005      # metres
    confidence_interval: float = 95.0        # percent
    free_std_dev: float = 10.0               # metres
    fixed_std_dev: float = 1.0e-6            # metres
    scale_normals_to_unity: bool = False
    stations_constrained: str = ""           # "name,CCC,name2,FFC,..."
    mode: str = "simultaneous"               # simultaneous | phased
    output_iter_stations: bool = False       # snapshot coords per iteration
    output_iter_adj_stat: bool = False       # per-iteration statistics
    output_iter_adj_msr: bool = False        # per-iteration adjusted msrs
    output_iter_cmp_msr: bool = False        # per-iteration computed msrs
    checkpoint_file: str = ""                # save/resume iteration state
    use_tpu: bool = False                    # route dense solves to the TPU
    profile: bool = False                    # hot-spot ns counters
    verbose_level: int = 0                   # >=3: dump matrices to .dbg
    debug_file: str = ""                     # .dbg path for verbose dumps
