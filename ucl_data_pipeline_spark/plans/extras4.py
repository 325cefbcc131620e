"""Round-5 operators: ANN recall gates for every index variant,
sketch-based high-cardinality robust z-scores, and companions.

Populated incrementally this round; each registration follows the
registry conventions (decimal-exact aggregates, atomic output
columns, oracle dtype CASTs).
"""

from __future__ import annotations
