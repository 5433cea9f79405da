"""Hard-constraint elimination — the f32/MXU-enabling reformulation.

The reference holds constrained ("C") station coordinates by adding huge
inverse-variance weights to the normals diagonal: fixed SD 1e-6 m vs free
SD 10 m (dnaoptions.hpp:430-432, AddConstraintStationstoNormalsSimultaneous
/ FormConstraintStationVarianceMatrix, dnaadjust.cpp:1884-2102).  That puts
~12 orders of magnitude of dynamic range on the diagonal; after unity
scaling the urban sample network still conditions at ~5.5e8, past what an
f32 factorization + f64 iterative refinement can recover (contraction
~ kappa * eps32 > 1).

This module removes the hard constraints from the parameter space instead:
each station's correction is orthogonally projected onto its *free*
subspace (in the local e,n,up frame for geographic/projected coordinates,
matching the reference's constraint frame), and the constrained subspace is
pinned with a unit diagonal so the system stays SPD with all shapes
unchanged (3 parameters per station — the block/junction partition
machinery is untouched):

    N~ = P N P + (1/var_free) P + (I - P)        per station, P symmetric
    b~ = P b                                      orthogonal projector

The solution of the pinned system automatically has zero correction along
constrained directions ((I-P) x = 0 because (I-P) N~ x = (I-P) b~ = 0), so
no back-substitution is needed; covariances are projected (P cov P) so
constrained directions report zero variance — the huge-weight formulation
reports ~1e-12 m^2 there, identical at output precision.  The free-subspace
solution differs from the huge-weight formulation by O(|rhs|/1e12) m,
orders below the reference's own 0.0005 m convergence threshold and its
0.001 dnadiff CI bars.

Measured effect (urban sample network, unity-scaled condition number):
5.5e8 (huge weights) -> 3.2e6 (eliminated) — inside the f32+refinement
envelope, which is what lets real networks use the MXU factorization
(parallel/schur.py DeviceSchurFactors method='inv') instead of emulated
f64.
"""

from __future__ import annotations

import numpy as np

from ..network.data import NetworkData
from ..geodesy.local_frame import rotation_local_to_cart
from .options import AdjustmentOptions


class ConstraintBasis:
    """Per-station free-subspace projectors and first-appearance diagonal
    terms for a network's constraint codes.

    Attributes
    ----------
    proj : dict[int, np.ndarray]
        Global station index -> (3,3) symmetric orthogonal projector onto
        the free subspace, cartesian basis.  Only stations with at least
        one "C" appear; absent stations are fully free (P = I).
    diag : dict[int, np.ndarray]
        Global station index -> (3,3) diagonal term to add at the
        station's first appearance: (1/var_free) P + (I - P).
    """

    def __init__(self, net: NetworkData, opts: AdjustmentOptions):
        var_f = opts.free_std_dev ** 2
        self.var_free = var_f
        self.proj: dict[int, np.ndarray] = {}
        self.diag: dict[int, np.ndarray] = {}
        eye = np.eye(3)
        for g in range(net.nstations):
            cc = (net.constraints[g] + "FFF")[:3]
            if "C" not in cc:
                continue
            if cc == "CCC":
                P = np.zeros((3, 3))
            elif net.coord_types[g] == "XYZ":
                P = np.diag([1.0 if c == "F" else 0.0 for c in cc])
            else:
                # constraint chars are ordered (lat,lon,h) for geographic
                # input, (e,n,up) otherwise — mirror constraint_weights
                geographic = net.coord_types[g].startswith("LL")
                i0, i1 = (1, 0) if geographic else (0, 1)
                m = np.ones(3)
                if cc[0] == "C":
                    m[i0] = 0.0
                if cc[1] == "C":
                    m[i1] = 0.0
                if cc[2] == "C":
                    m[2] = 0.0
                R = rotation_local_to_cart(net.lat[g], net.lon[g])
                P = R @ np.diag(m) @ R.T
                P = 0.5 * (P + P.T)
            self.proj[g] = P
            self.diag[g] = P * (1.0 / var_f) + (eye - P)

    # -- per-block system transform -------------------------------------

    def transform_block(self, stations, local, N: np.ndarray,
                        rhs: np.ndarray, first_set) -> None:
        """In place: project N/rhs strips of constrained stations and add
        the first-appearance diagonal terms (free weight for unconstrained
        stations: caller adds its own eye/var_f via constraint_weights —
        identical for all-F codes).

        stations: iterable of global station indices in the block;
        local: mapping global -> local station index.
        """
        for g in stations:
            P = self.proj.get(g)
            if P is None:
                continue
            l = 3 * local[g]
            N[l:l + 3, :] = P @ N[l:l + 3, :]
            N[:, l:l + 3] = N[:, l:l + 3] @ P
            rhs[l:l + 3] = P @ rhs[l:l + 3]
        for g in first_set:
            if g not in local:
                continue
            D = self.diag.get(g)
            if D is None:
                continue
            l = 3 * local[g]
            N[l:l + 3, l:l + 3] += D

    def project_cov(self, stations, local, cov: np.ndarray) -> None:
        """In place: cov -> P cov P (constrained directions report zero
        variance, as elimination implies)."""
        for g in stations:
            P = self.proj.get(g)
            if P is None:
                continue
            l = 3 * local[g]
            cov[l:l + 3, :] = P @ cov[l:l + 3, :]
            cov[:, l:l + 3] = cov[:, l:l + 3] @ P
