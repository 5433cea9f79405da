"""dynadjust_tpu — a TPU-native geodetic network adjustment framework.

A from-scratch reimplementation of the capabilities of
GeoscienceAustralia/DynAdjust (rigorous least-squares adjustment of
geodetic networks) designed for JAX/XLA/Pallas on TPU:

- import of DNA v1/v3 station & measurement files, SINEX, JSONL
- NTv2 geoid grid interpolation (AUSGeoid) with deflections of the vertical
- Helmert 14-parameter reference-frame transformations and plate motion models
- simultaneous (dense) and phased (block Schur-complement) least-squares
  adjustment with full variance propagation and statistical testing
- sharded multi-device adjustment over a `jax.sharding.Mesh`

Double precision is mandatory for mm-level geodesy, so x64 is enabled at
package import (reference requirement: DynAdjust uses LAPACK doubles
throughout; see SURVEY.md §6).
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
