"""Pandas UDAF surface (SURVEY.md §2.10) — the custom-aggregate escape
hatch: Arrow ships each group's columns to one Python call, numpy
reduces them.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the GROUPED_AGG eval type from *resolved* type hints, and
stringified annotations referencing a function-local import don't
resolve.

Float partial order in numpy differs from SQL, so queries using this
are contract-tested against the exact decimal formula
(dsum(w*v)/dsum(w)) instead of value-hashed. Prefer expression-level
aggregates whenever the math admits them — this path exists for
aggregations that genuinely need numpy/scipy.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    return float(np.average(v.to_numpy(), weights=w.to_numpy()))
