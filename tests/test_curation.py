"""URL/domain curation tier (operators/curation.py)."""

from pyspark.sql import functions as F

from vectordb_light_spark.operators.curation import (
    domain_frequency_cap,
    normalize_url,
    url_domain,
    url_exact_dedup,
)


def test_normalize_url_cases(spark):
    cases = [
        # (raw, expected)
        ("https://a.example.com/x", "https://a.example.com/x"),
        ("  https://a.example.com/x  ", "https://a.example.com/x"),
        ("HTTPS://A.EXAMPLE.COM/Path/X", "https://a.example.com/Path/X"),
        ("https://a.example.com/x/", "https://a.example.com/x"),
        ("https://www.a.example.com/x", "https://a.example.com/x"),
        ("https://a.example.com:443/x", "https://a.example.com/x"),
        ("http://a.example.com:80/x", "http://a.example.com/x"),
        ("http://a.example.com:8080/x", "http://a.example.com:8080/x"),
        ("https://a.example.com/x#sec-2", "https://a.example.com/x"),
        ("https://a.example.com/x?utm_source=f", "https://a.example.com/x"),
        ("https://a.example.com/x?utm_a=1&utm_b=2", "https://a.example.com/x"),
        ("https://a.example.com/x?utm_a=1&ref=z", "https://a.example.com/x?ref=z"),
        ("https://a.example.com/x?ref=z&utm_a=1", "https://a.example.com/x?ref=z"),
        ("https://a.example.com/x?ref=z", "https://a.example.com/x?ref=z"),
        # literal '&' in a query-less path: repair must NOT promote it
        ("https://a.example.com/a&b", "https://a.example.com/a&b"),
        ("https://a.example.com/a&b?utm_x=1", "https://a.example.com/a&b"),
        # r6 ADVICE: '&...=' in a query-less path must survive even
        # when it LOOKS like a parameter — no utm strip happened, so
        # the repair must not fire and distinct URLs must not fold
        ("https://a.example.com/a&b=c", "https://a.example.com/a&b=c"),
        # ...and must still survive when a non-leading utm param was
        # stripped (query did not BEGIN with utm_, '?' still present)
        (
            "https://a.example.com/a&b=c?ref=z&utm_a=1",
            "https://a.example.com/a&b=c?ref=z",
        ),
        # repair still fires when the query began with utm_
        (
            "https://a.example.com/p?utm_a=1&ref=z&x=2",
            "https://a.example.com/p?ref=z&x=2",
        ),
        # path/query case is preserved; only scheme+authority folds
        ("HTTP://B.Example.Com/CaseY?Q=Up", "http://b.example.com/CaseY?Q=Up"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalize_url("url").alias("n")).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_domain_extraction(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.com/x"),
            (2, "https://user:pw@b.example.com/x"),
            (3, "http://c.example.com:8080/x"),
        ],
        "i long, url string",
    )
    got = {r["i"]: r["d"] for r in df.select("i", url_domain("url").alias("d")).collect()}
    assert got == {1: "a.example.com", 2: "b.example.com", 3: "c.example.com"}


def test_url_exact_dedup_min_id_survivor(spark):
    df = spark.createDataFrame(
        [
            (10, "https://a.example.com/x/"),
            (7, "HTTPS://A.EXAMPLE.COM/x"),          # same resource, min id
            (12, "https://a.example.com/x?utm_s=1"),  # same resource
            (3, "https://a.example.com/y"),           # distinct
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in url_exact_dedup(df).collect()}
    assert rows[7]["keep"] is True
    assert rows[10]["keep"] is False and rows[12]["keep"] is False
    assert rows[3]["keep"] is True
    assert rows[10]["url_norm"] == rows[7]["url_norm"] == rows[12]["url_norm"]


def test_domain_frequency_cap_keeps_lowest_ids(spark):
    rows = [(i, f"https://hot.example.com/p{i}") for i in range(10)]
    rows += [(100, "https://cold.example.com/p")]
    df = spark.createDataFrame(rows, "doc_id long, url_norm string")
    got = {r["doc_id"]: r for r in domain_frequency_cap(df, 4).collect()}
    kept_hot = sorted(d for d, r in got.items() if r["keep"] and r["domain"] == "hot.example.com")
    assert kept_hot == [0, 1, 2, 3]   # deterministic lowest ids
    assert got[100]["keep"] is True   # under-cap domain untouched
    # rerun-stable: identical output on a second evaluation
    again = {r["doc_id"]: r["keep"] for r in domain_frequency_cap(df, 4).collect()}
    assert again == {d: r["keep"] for d, r in got.items()}
