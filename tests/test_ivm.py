"""Incremental view maintenance (operators/ivm.py): delta application
must equal recompute, exactly, through every change class."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_prediction_pyspark_spark.operators import ivm

KEYS = ["g"]
MEAS = ["v"]


def _mv(spark, rows):
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    return df, ivm.materialize_agg(df, keys=KEYS, measures=MEAS)


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "op string, g string, v double, g__old string, v__old double"
    )


def _as_map(df):
    return {
        r["g"]: (r["n_rows"], float(r["sum_v"]))
        for r in df.collect()
    }


def test_insert_delete_update(spark):
    base, mv0 = _mv(
        spark, [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)]
    )
    feed = _feed(
        spark,
        [
            ("I", "b", 7.0, None, None),       # new row in b
            ("D", None, None, "a", 10.0),      # remove id 1
            ("U", "a", 25.0, "a", 20.0),       # reprice id 2
        ],
    )
    got = _as_map(ivm.apply_agg_deltas(mv0, feed, keys=KEYS, measures=MEAS))
    assert got == {"a": (1, 25.0), "b": (2, 12.0)}


def test_group_moving_update(spark):
    _, mv0 = _mv(spark, [(1, "a", 10.0), (2, "b", 5.0)])
    feed = _feed(spark, [("U", "b", 10.0, "a", 10.0)])
    got = _as_map(ivm.apply_agg_deltas(mv0, feed, keys=KEYS, measures=MEAS))
    # 'a' reached count 0 and is dropped; both rows now in 'b'
    assert got == {"b": (2, 15.0)}


def test_malformed_op_fails_the_batch(spark):
    """Exactness contract: an op outside I/U/D must raise, not be
    silently dropped (a dangling when-chain would yield NULL and the
    maintained view would drift without any error)."""
    import pytest
    from pyspark.errors import PySparkException

    _, mv0 = _mv(spark, [(1, "a", 10.0)])
    for bad in ["X", None]:
        feed = _feed(spark, [("I", "b", 7.0, None, None), (bad, "a", 1.0, "a", 1.0)])
        with pytest.raises(PySparkException, match="invalid op"):
            ivm.apply_agg_deltas(mv0, feed, keys=KEYS, measures=MEAS).collect()


def test_full_retraction_drops_group_and_new_group_appears(spark):
    _, mv0 = _mv(spark, [(1, "a", 3.0)])
    feed = _feed(
        spark, [("D", None, None, "a", 3.0), ("I", "zz", 1.5, None, None)]
    )
    got = _as_map(ivm.apply_agg_deltas(mv0, feed, keys=KEYS, measures=MEAS))
    assert got == {"zz": (1, 1.5)}


def test_two_batches_equal_recompute(spark):
    base, mv0 = _mv(
        spark,
        [(i, "g%d" % (i % 3), float(i) + 0.25) for i in range(30)],
    )
    b1 = _feed(
        spark,
        [("D", None, None, "g0", 0.25), ("U", "g1", 99.5, "g1", 1.25)],
    )
    b2 = _feed(
        spark,
        [("I", "g3", 4.75, None, None), ("U", "g0", 3.25, "g2", 2.25)],
    )
    mv = ivm.apply_agg_deltas(mv0, b1, keys=KEYS, measures=MEAS)
    mv = ivm.apply_agg_deltas(mv, b2, keys=KEYS, measures=MEAS)
    # recompute: apply the same logical changes row-wise to the base
    rows = [(i, "g%d" % (i % 3), float(i) + 0.25) for i in range(30)]
    rows.remove((0, "g0", 0.25))
    rows.remove((1, "g1", 1.25))
    rows.append((100, "g1", 99.5))
    rows.remove((2, "g2", 2.25))
    rows.append((101, "g0", 3.25))
    rows.append((102, "g3", 4.75))
    want = _as_map(
        ivm.materialize_agg(
            spark.createDataFrame(rows, ["id", "g", "v"]),
            keys=KEYS,
            measures=MEAS,
        )
    )
    assert _as_map(mv) == want


def test_random_cdc_sequences_equal_recompute(spark):
    """Property: ANY valid I/U/D sequence, split into ANY batching,
    delta-maintains to exactly the recompute of the final state."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        state = {}  # id -> (g, v)
        base_rows = []
        for i in range(20):
            g, v = f"g{rng.randrange(4)}", round(rng.uniform(-50, 50), 2)
            state[i] = (g, v)
            base_rows.append((i, g, v))
        base = spark.createDataFrame(base_rows, ["id", "g", "v"])
        mv = ivm.materialize_agg(base, keys=KEYS, measures=MEAS)

        next_id = 100
        for _batch in range(3):
            ops = []
            for _ in range(rng.randrange(1, 6)):
                choice = rng.random()
                if choice < 0.3 and state:  # delete
                    i = rng.choice(list(state))
                    g, v = state.pop(i)
                    ops.append(("D", None, None, g, v))
                elif choice < 0.6 and state:  # update (maybe group move)
                    i = rng.choice(list(state))
                    og, ov = state[i]
                    ng = f"g{rng.randrange(4)}"
                    nv = round(rng.uniform(-50, 50), 2)
                    state[i] = (ng, nv)
                    ops.append(("U", ng, nv, og, ov))
                else:  # insert
                    g, v = f"g{rng.randrange(4)}", round(rng.uniform(-50, 50), 2)
                    state[next_id] = (g, v)
                    next_id += 1
                    ops.append(("I", g, v, None, None))
            if not ops:
                continue
            feed = spark.createDataFrame(
                ops, "op string, g string, v double, g__old string, v__old double"
            )
            mv = ivm.apply_agg_deltas(mv, feed, keys=KEYS, measures=MEAS)

        final_rows = [(i, g, v) for i, (g, v) in state.items()]
        want = _as_map(
            ivm.materialize_agg(
                spark.createDataFrame(final_rows, ["id", "g", "v"]),
                keys=KEYS,
                measures=MEAS,
            )
        )
        assert _as_map(mv) == want, f"seed {seed}"
