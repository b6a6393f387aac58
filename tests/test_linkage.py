"""Record linkage (operators/linkage.py): blocking, distance cap,
deterministic tie-break."""

from __future__ import annotations

from nyc_taxi_data_prediction_pyspark_spark.operators import linkage


def _frames(spark):
    clean = spark.createDataFrame(
        [
            (1, "alice smith", "us"),
            (2, "alicia smith", "us"),
            (3, "bob jones", "us"),
            (4, "alice smith", "uk"),
        ],
        "cid long, cname string, region string",
    )
    dirty = spark.createDataFrame(
        [
            (100, "alice smyth", "us"),   # 1 edit from cid 1, 2 from cid 2
            (101, "bobb jones", "us"),    # 1 edit from cid 3
            (102, "zzzzzz", "us"),        # no match within 2
            (103, "alice smith", "uk"),   # exact, but only within its block
        ],
        "did long, dname string, region string",
    )
    return dirty, clean


def test_link_records_best_match_and_cap(spark):
    dirty, clean = _frames(spark)
    out = linkage.link_records(
        dirty, clean,
        block_keys=["region"], dirty_id="did", clean_id="cid",
        dirty_text="dname", clean_text="cname", max_distance=2,
    )
    got = {r["did"]: (r["matched_id"], r["dist"]) for r in out.collect()}
    # 102 has no candidate within distance 2 -> absent entirely
    assert got == {100: (1, 1), 101: (3, 1), 103: (4, 0)}


def test_link_records_blocking_is_a_hard_wall(spark):
    dirty, clean = _frames(spark)
    # the uk dirty row matches the us "alice smith" at distance 0 —
    # but blocking must prevent it from ever seeing that candidate
    out = linkage.link_records(
        dirty.where("did = 103"), clean.where("region = 'us'"),
        block_keys=["region"], dirty_id="did", clean_id="cid",
        dirty_text="dname", clean_text="cname", max_distance=2,
    )
    assert out.count() == 0


def test_link_records_tie_breaks_to_lowest_id(spark):
    clean = spark.createDataFrame(
        [(7, "aaab", "g"), (5, "aaac", "g")], "cid long, cname string, region string"
    )
    dirty = spark.createDataFrame(
        [(1, "aaad", "g")], "did long, dname string, region string"
    )
    out = linkage.link_records(
        dirty, clean,
        block_keys=["region"], dirty_id="did", clean_id="cid",
        dirty_text="dname", clean_text="cname", max_distance=2,
    ).collect()
    assert out[0]["matched_id"] == 5 and out[0]["dist"] == 1


def test_multiblock_recovers_matches_single_blocking_misses(spark):
    # record 200's REGION is corrupted, so region-blocking can never
    # find its match; a second pass blocking on segment recovers it
    clean = spark.createDataFrame(
        [(1, "alice smith", "us", "retail"), (2, "bob jones", "uk", "bank")],
        "cid long, cname string, region string, seg string",
    )
    dirty = spark.createDataFrame(
        [
            (100, "alice smyth", "us", "wholesale"),  # found by region pass
            (200, "bob jonez", "zz", "bank"),          # only the seg pass can see cid 2
        ],
        "did long, dname string, region string, seg string",
    )
    kw = dict(dirty_id="did", clean_id="cid", dirty_text="dname",
              clean_text="cname", max_distance=2)
    single = linkage.link_records(dirty, clean, block_keys=["region"], **kw)
    assert {r["did"] for r in single.collect()} == {100}
    multi = linkage.link_records_multiblock(
        dirty, clean, block_key_sets=[["region"], ["seg"]], **kw
    )
    got = {r["did"]: (r["matched_id"], r["dist"]) for r in multi.collect()}
    assert got == {100: (1, 1), 200: (2, 1)}


def test_multiblock_dedups_candidates_found_by_both_passes(spark):
    clean = spark.createDataFrame(
        [(1, "alice smith", "us", "retail")],
        "cid long, cname string, region string, seg string",
    )
    dirty = spark.createDataFrame(
        [(100, "alice smyth", "us", "retail")],
        "did long, dname string, region string, seg string",
    )
    multi = linkage.link_records_multiblock(
        dirty, clean, block_key_sets=[["region"], ["seg"]],
        dirty_id="did", clean_id="cid", dirty_text="dname",
        clean_text="cname", max_distance=2,
    )
    rows = multi.collect()
    assert len(rows) == 1 and rows[0]["matched_id"] == 1
