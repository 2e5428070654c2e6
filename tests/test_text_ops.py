

def test_url_blocklist_filter_boundaries(spark):
    """Suffix matching honors dot boundaries: example.com blocks its
    subdomains but not badexample.com; deeper-than-max domains raise."""
    import pytest

    from spark_extensions_spark.functions.url import url_blocklist_filter

    rows = [
        (1, "https://example.com/x"),
        (2, "https://cdn.example.com/x"),
        (3, "https://a.b.example.com/x"),
        (4, "https://badexample.com/x"),
        (5, "https://EXAMPLE.com/y"),
        (6, "https://safe.org/x"),
        (7, "https://deep.bad.example.org/x"),
        (8, "https://bad.example.org/x"),
        (9, "https://example.org/x"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    block = spark.createDataFrame(
        [("example.com",), ("Bad.Example.org",)], "domain string"
    )
    kept = {r["id"] for r in url_blocklist_filter(df, "url", block).collect()}
    assert kept == {4, 6, 9}

    too_deep = spark.createDataFrame(
        [("a.b.c.d.e.com",)], "domain string"
    )
    with pytest.raises(ValueError, match="max_labels"):
        url_blocklist_filter(df, "url", too_deep)
