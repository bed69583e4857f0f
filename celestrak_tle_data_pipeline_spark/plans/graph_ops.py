"""Round-9 fresh registrations: graph analytics over the TPC-H trade graph.

The reference has no graph surface; these are [EXT] components
(X246-X250 in SURVEY §2.11) giving the engine the graph-shaped
operators a training-data/analytics platform needs — link analysis,
cohesion, fuzzy matching — all as pure DataFrame plans with exact
DECIMAL arithmetic so the DuckDB oracle hashes match bit-for-bit.

Queries register here as they are built this round; the round-9
official window is the 45 flipped bank names (plans/next_window.py)
plus these, 50 exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .common import dec, t
