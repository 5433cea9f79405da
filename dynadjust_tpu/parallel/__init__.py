from .schur import BlockSystem, build_block_system, schur_solve, schur_solve_sharded
