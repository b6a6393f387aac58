"""Dump .explain('formatted') for named queries into plans/r14/
as <query>_<tag>.txt — the optimization round's before/after plan
evidence (judge contract).

Usage: python tools/dump_plan_files.py TAG [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and os.path.isdir(sys.argv[2]) else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[2:] if not os.path.isdir(a)]

    import __spark_entry__ as entry
    from nyc_taxi_data_prediction_pyspark_spark.session import get_spark

    qs = entry.queries()
    spark = get_spark("dump-plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building {n}: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {n} — explain('formatted') at {sf_dir} [{tag}]\n\n{text}")
        nex = text.count("Exchange")
        print(f"{n}: exchanges~{nex} -> {path}")


if __name__ == "__main__":
    main()
