"""Driver-side Dataset -> Arrow table collection for SMALL results.

``Dataset.to_arrow_refs`` can yield zero-column placeholder blocks (e.g.
from ``map_groups`` tasks that produced no rows); ``pa.concat_tables``
refuses to mix those with real schemas.  ``collect_arrow`` drops the
degenerate blocks and concatenates the rest.  Only for results known to
be small (broadcast sides, canonical tables) — never the corpus.
"""

from __future__ import annotations

import pyarrow as pa
import ray


def collect_arrow(ds) -> pa.Table:
    tbls = [ray.get(r) for r in ds.to_arrow_refs()]
    real = [t for t in tbls if t.num_columns > 0]
    nonempty = [t for t in real if t.num_rows > 0]
    if nonempty:
        return pa.concat_tables(nonempty)
    if real:
        return real[0]
    return pa.table({})
