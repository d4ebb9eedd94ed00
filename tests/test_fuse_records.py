"""fuse_records contract tests: each survivorship rule isolated, tie
determinism, single-member clusters, no-rule minimal call."""

from __future__ import annotations

from datafusion_ballista_python_spark.operators.dedup import fuse_records


def _df(spark):
    rows = [
        # cluster 1: lengths 5/7/7 (tie on 7 -> lowest id wins), langs en/en/de
        (10, 1, "aaaaa", 100, "en"),
        (11, 1, "bbbbbbb", 300, "en"),
        (12, 1, "ccccccc", 200, "de"),
        # cluster 2: single member
        (20, 2, "solo", 50, "fr"),
        # cluster 3: mode tie en/de 1-1 -> lexicographic 'de'
        (30, 3, "x", 1, "en"),
        (31, 3, "yy", 2, "de"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, cluster long, text string, score long, lang string"
    )


def test_all_rules(spark):
    out = {
        r["cluster"]: r.asDict()
        for r in fuse_records(
            _df(spark),
            "cluster",
            id_col="doc_id",
            longest_col="text",
            max_cols=["score"],
            min_cols=["doc_id"],
            mode_cols=["lang"],
        ).collect()
    }
    c1 = out[1]
    assert c1["n_members"] == 3
    assert c1["text"] == "bbbbbbb"  # length tie 7 vs 7 -> doc 11 < 12
    assert c1["score"] == 300 and c1["doc_id"] == 10
    assert c1["lang"] == "en"  # 2 en vs 1 de
    c2 = out[2]
    assert c2["n_members"] == 1 and c2["text"] == "solo" and c2["lang"] == "fr"
    c3 = out[3]
    assert c3["lang"] == "de"  # 1-1 mode tie -> lexicographic


def test_counts_only(spark):
    out = fuse_records(_df(spark), "cluster").collect()
    assert {r["cluster"]: r["n_members"] for r in out} == {1: 3, 2: 1, 3: 2}


def test_deterministic(spark):
    kw = dict(
        id_col="doc_id", longest_col="text", max_cols=["score"], mode_cols=["lang"]
    )
    a = sorted(map(tuple, fuse_records(_df(spark), "cluster", **kw).collect()))
    b = sorted(map(tuple, fuse_records(_df(spark), "cluster", **kw).collect()))
    assert a == b
