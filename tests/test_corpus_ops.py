"""Semantic invariants of the r7 corpus-assembly tier (queries/corpus.py)
and the §2.7 pivot/unpivot/histogram extensions (queries/core.py).

The oracle gate proves cross-engine value equality; these tests pin the
PROPERTIES that make each operator correct-by-construction — token
conservation under chunking/packing, global uniqueness after span dedup,
zero residual PII after redaction, exact mixture ratios — so a future
refactor that stays hash-equal-by-luck on the testdata still cannot
silently change semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries.core import (
    q_histogram_fixed,
    q_pivot_wide,
    q_unpivot_long,
)
from imperio_patitas_etl_spark.queries.corpus import (
    CHUNK_TOKENS,
    MIX_DEN,
    PACK_BUDGET,
    PII_EMAIL,
    PII_PHONE,
    q_chunk_sequences,
    q_domain_mixture,
    q_domain_mixture_sample,
    q_pack_sequences,
    q_pii_redact,
    q_span_dedup,
)


def _doc_tokens(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        )
    )


def test_chunk_sequences_conserves_tokens(spark, sf_dir):
    chunks = q_chunk_sequences(spark, sf_dir)
    docs = _doc_tokens(spark, sf_dir)

    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("chunk_tok").alias("tok_sum"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_tok").alias("max_chunk"),
        F.min("chunk_tok").alias("min_chunk"),
    )
    joined = per_doc.join(docs, "doc_id")
    assert joined.count() == docs.count()
    # every token lands in exactly one chunk; chunk sizes bounded
    bad = joined.filter(
        (F.col("tok_sum") != F.col("n_tok"))
        | (F.col("max_chunk") > CHUNK_TOKENS)
        | (F.col("min_chunk") < 1)
        | (F.col("n_chunks") != F.ceil(F.col("n_tok") / CHUNK_TOKENS))
    )
    assert bad.count() == 0


def test_pack_sequences_conserves_tokens_and_bins_are_dense(spark, sf_dir):
    bins = q_pack_sequences(spark, sf_dir)
    docs = _doc_tokens(spark, sf_dir)

    per_source = bins.groupBy("source").agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.sum("n_docs").alias("doc_sum"),
        F.min("bin_id").alias("min_bin"),
        F.max("bin_id").alias("max_bin"),
        F.count("*").alias("n_bins"),
    )
    truth = docs.groupBy("source").agg(
        F.sum("n_tok").alias("tok_truth"), F.count("*").alias("doc_truth")
    )
    j = per_source.join(truth, "source")
    # conservation + contiguous bin ids 0..max (contiguity holds because
    # a doc starting in bin k implies bins 0..k-1 are full)
    bad = j.filter(
        (F.col("tok_sum") != F.col("tok_truth"))
        | (F.col("doc_sum") != F.col("doc_truth"))
        | (F.col("min_bin") != 0)
        | (F.col("n_bins") != F.col("max_bin") + 1)
    )
    assert bad.count() == 0
    # bins other than each source's last must be at least budget-full
    # when counting the straddling head (fill can only be < budget for
    # the final bin)
    last = bins.groupBy("source").agg(F.max("bin_id").alias("last_bin"))
    nonlast = bins.join(last, "source").filter(F.col("bin_id") != F.col("last_bin"))
    assert nonlast.filter(F.col("n_tokens") * 10000 / PACK_BUDGET < 5000).count() == 0


def test_span_dedup_is_globally_unique_and_monotone(spark, sf_dir):
    out = q_span_dedup(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # no document gains spans, and the corpus-wide kept-span count equals
    # the number of DISTINCT spans in the corpus (every duplicate dropped,
    # every distinct span kept exactly once)
    spans_expr = (
        "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 10) AS INT) - 1),"
        " i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))"
    )
    exploded = docs.select(F.explode(F.expr(spans_expr)).alias("span"))
    n_distinct = exploded.distinct().count()
    kept_total = out.agg(F.sum("n_kept_spans")).collect()[0][0]
    assert kept_total == n_distinct

    per_doc = docs.select(
        "doc_id", F.size(F.expr(spans_expr)).cast("long").alias("n_spans")
    )
    j = out.join(per_doc, "doc_id")
    assert j.filter(F.col("n_kept_spans") > F.col("n_spans")).count() == 0


def test_intra_doc_dedup_keeps_cross_doc_repeats(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.corpus import (
        q_intra_doc_dedup,
        q_span_dedup,
    )

    intra = q_intra_doc_dedup(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # every document survives (unlike global span_dedup, which can drop
    # a doc whose every span appeared earlier), and per-doc kept spans
    # equal the doc's DISTINCT span count
    assert intra.count() == docs.count()
    spans_expr = (
        "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 10) AS INT) - 1),"
        " i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))"
    )
    truth = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.expr(spans_expr))).cast("long").alias("n_distinct"),
    )
    j = intra.join(truth, "doc_id")
    assert j.filter(F.col("n_kept_spans") != F.col("n_distinct")).count() == 0
    # the global pass is strictly stronger: per doc it keeps a subset
    glob = q_span_dedup(spark, sf_dir).select(
        "doc_id", F.col("n_kept_spans").alias("n_glob")
    )
    jg = intra.join(glob, "doc_id", "left")
    assert jg.filter(
        F.col("n_glob").isNotNull() & (F.col("n_glob") > F.col("n_kept_spans"))
    ).count() == 0


def test_pii_redact_leaves_no_matches(spark, sf_dir):
    out = q_pii_redact(spark, sf_dir)
    # the deterministic trailer plants exactly one email and one phone
    assert out.filter((F.col("n_emails") < 1) | (F.col("n_phones") != 1)).count() == 0

    # rebuild the redacted text with the same expressions and prove the
    # scrubber left nothing behind
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +56 9 "),
        F.lpad(((F.col("doc_id") * 7919) % 100000000).cast("string"), 8, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )
    residue = d.select(
        (F.regexp_count(red, F.lit(PII_EMAIL)) + F.regexp_count(red, F.lit(PII_PHONE))).alias("n")
    )
    assert residue.filter(F.col("n") > 0).count() == 0


def test_domain_mixture_hits_target_exactly(spark, sf_dir):
    mix = q_domain_mixture(spark, sf_dir).collect()
    # quotas never exceed availability, and each source's kept count is
    # exactly floor(T * num / DEN) for one shared T
    assert all(r["kept"] <= r["n_docs"] for r in mix)
    for r in mix:
        num = int(r["source"][3:]) + 1
        assert r["target_bp"] == num * 10000 // MIX_DEN
    # the sample realizes the quotas exactly
    sample = q_domain_mixture_sample(spark, sf_dir)
    got = {r["source"]: r["n"] for r in sample.groupBy("source").agg(F.count("*").alias("n")).collect()}
    want = {r["source"]: r["kept"] for r in mix if r["kept"] > 0}
    assert got == want


def test_pivot_unpivot_histogram_totals(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total_cents = ev.select(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    ).collect()[0][0]
    wide = q_pivot_wide(spark, sf_dir)
    cols = [c for c in wide.columns if c.endswith("_cents")]
    pivot_total = wide.select(
        F.sum(sum(F.coalesce(F.col(c), F.lit(0)) for c in cols)).alias("c")
    ).collect()[0][0]
    assert pivot_total == total_cents

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price_cents = li.select(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("c")
    ).collect()[0][0]
    long = q_unpivot_long(spark, sf_dir)
    assert long.count() == 12
    got = long.filter(F.col("metric") == "extendedprice").agg(
        F.sum("sum_cents")
    ).collect()[0][0]
    assert got == price_cents

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = q_histogram_fixed(spark, sf_dir)
    assert hist.agg(F.sum("n")).collect()[0][0] == orders.count()
