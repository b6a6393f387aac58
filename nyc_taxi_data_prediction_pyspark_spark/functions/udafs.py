"""Pandas UDAF surface (SURVEY.md §2.10) — the custom-aggregate escape
hatch: Arrow ships each group's columns to one Python call.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the GROUPED_AGG eval type from *resolved* type hints, and
stringified annotations referencing a function-local import don't
resolve.

``weighted_mean`` computes the exact closed form Σ(v·w)/Σ(w) with
order-independent decimal arithmetic (each term quantized to 6 dp
HALF_UP — the same rule as Spark's double→DECIMAL(18,6) cast — then
summed exactly), so the UDAF's result is bit-identical to
``dsum(v*w)/dsum(w)`` and to the DuckDB oracle regardless of Arrow
batch/partition order. A float-sum UDAF (np.average) would drift in
the low bits run-to-run, which breaks exact verification — the same
reason operators/aggregates.dsum exists. Prefer expression-level
aggregates whenever the math admits them; this path exists for
aggregations that genuinely need per-group Python.
"""

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql.functions import pandas_udf

_Q6 = Decimal("0.000001")


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    num = Decimal(0)
    den = Decimal(0)
    for x, y in zip(v.to_numpy(), w.to_numpy()):
        num += Decimal(float(x) * float(y)).quantize(_Q6, ROUND_HALF_UP)
        den += Decimal(float(y)).quantize(_Q6, ROUND_HALF_UP)
    return float(num) / float(den) if den else float("nan")
