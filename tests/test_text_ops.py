"""Unit tests for text curation ops whose positive paths the synthetic
documents table can't exercise (it contains no PII-shaped strings)."""

from pyspark.sql import functions as F

from s2spark import text as T


def test_pii_scan_positive_cases(spark, tmp_path):
    rows = [
        (1, "mail me at a.b+c@x-y.org or z@q.io thanks"),
        (2, "no pii here at all"),
        (3, "see http://a.io and https://b.co/x?z=1 now"),
        (4, "call 555-123-4567 or 555 999 0000 today"),
        (5, "mixed bob@corp.com visits https://c.dev 555-000-1111"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: (r["n_emails"], r["n_urls"], r["n_phones"],
                         r["keep"])
           for r in T.pii_scan(spark, sf).collect()}
    assert out[1] == (2, 0, 0, False)
    assert out[2] == (0, 0, 0, True)
    assert out[3] == (0, 2, 0, False)
    assert out[4] == (0, 0, 2, False)
    assert out[5] == (1, 1, 1, False)


def test_stratified_sample_rates(spark, sf_dir):
    """kept fraction per stratum lands near its configured pct (the
    hash is uniform), and the kept set is reproducible."""
    a = sorted(map(tuple, T.stratified_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, T.stratified_sample(spark, sf_dir).collect()))
    assert a == b and a
    totals = {r["pred_lang"]: r["n"]
              for r in T.lang_id(spark, sf_dir)
              .groupBy("pred_lang").agg(F.count("*").alias("n"))
              .collect()}
    from collections import Counter
    kept = Counter(lang for _, lang in a)
    for lang, n_kept in kept.items():
        frac = n_kept / totals[lang]
        pct = T.SAMPLE_PCT[lang] / 100.0
        assert abs(frac - pct) < 0.25  # small-sample tolerance
