"""Lazy block-scoped a-posteriori covariance access.

Past the dense-covariance cap (DTA_DENSE_COV_MAX_STN) the full (3S,3S)
matrix is never materialised — it would be terabytes at national scale.
The reference has the same regime: in phased mode it prints
inter-station covariances only from the rigorous PER-BLOCK variance
matrices (dnaadjust_printer.cpp:4330-4390, serialisation
dnaadjust.cpp:6770); stations in different blocks have no printed
covariance.  This provider reproduces exactly that: per-block covariance
matrices are rebuilt on demand from the retained Schur factors (the same
block-inverse identities the statistics pass uses) with a small LRU, so
the writers get within-block station-pair covariances in O(S·k) memory.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


class BlockCovProvider:
    def __init__(self, compute, block_stations, cache_blocks: int = 4):
        """compute(b) -> (3k, 3k) covariance in block-local station
        order; block_stations[b] = global station indices of block b."""
        self._compute = compute
        self.block_stations = [np.asarray(s, dtype=np.int64)
                               for s in block_stations]
        self._local = [dict((int(g), i) for i, g in enumerate(s))
                       for s in self.block_stations]
        # primary (first-appearance) block per station — the block whose
        # rigorous variances the reference reports for the station
        self._primary = {}
        for b, st in enumerate(self.block_stations):
            for g in st:
                self._primary.setdefault(int(g), b)
        self._cache = OrderedDict()
        self._cache_blocks = cache_blocks

    def block_of(self, g: int) -> int:
        return self._primary[int(g)]

    def block_cov(self, b: int) -> np.ndarray:
        c = self._cache.get(b)
        if c is None:
            c = self._compute(b)
            self._cache[b] = c
            while len(self._cache) > self._cache_blocks:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(b)
        return c

    def partners(self, g: int):
        """Stations sharing g's primary block (including g)."""
        return self.block_stations[self.block_of(g)]

    def pair_cov(self, i: int, j: int) -> np.ndarray | None:
        """(3,3) covariance of stations i, j, or None when they share no
        block (the reference's phased mode likewise prints none)."""
        b = self._primary.get(int(i))
        if b is None:
            return None
        lj = self._local[b].get(int(j))
        if lj is None:
            bj = self._primary.get(int(j))
            if bj is None:
                return None
            if int(i) in self._local[bj]:
                b, lj = bj, self._local[bj][int(j)]
            else:
                return None
        li = self._local[b][int(i)]
        C = self.block_cov(b)
        return C[3 * li:3 * li + 3, 3 * lj:3 * lj + 3]
