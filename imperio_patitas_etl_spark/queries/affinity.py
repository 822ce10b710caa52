"""Affinity / reconciliation / retrieval analytics (r7b).

Beyond-reference tier (same mandate as ``queries/corpus.py``): the
cross-table analytics a 100 TB warehouse grows once the reference's
entity pipeline (app/services/etl_service.py) is feeding it —

- ``item_cooccurrence`` — market-basket pair support + lift over the
  order/part bipartite relation (the "bought together" query);
- ``pagerank_copurchase`` — fixed-iteration PageRank centrality over the
  co-purchase graph, pure integer arithmetic so the ranking is
  bit-reproducible across engines and cluster re-runs;
- ``snapshot_diff`` — CDC-style reconciliation of two per-order state
  snapshots via row fingerprints (the standard "did the backfill change
  anything" audit between warehouse loads);
- ``bm25_topk`` — BM25 ranked retrieval over the documents corpus,
  integerized to micro-nats like ``unigram_logprob``.

Exactness: every aggregate is integer (units/micro-nats); every divide
is integral ``div`` on DECIMAL(38,0) operands (Spark) mirrored by ``//``
on HUGEINT (DuckDB) — per ADVICE r6, operands are widened BEFORE any
multiply so no product can wrap at any corpus size. The only float op
is the per-distinct-term ``ln`` in BM25's idf, computed on an identical
double in both engines (the ``unigram_logprob`` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from imperio_patitas_etl_spark.operators.checkpoint import (
    OwnedFamily,
    persistent_rdd_ids,
)
from imperio_patitas_etl_spark.operators.graph import pagerank_fixed
from imperio_patitas_etl_spark.operators.provenance import (
    require_source,
    retag_table,
    tag_source,
)
from imperio_patitas_etl_spark.operators.reconcile import classify_snapshot_diff
from imperio_patitas_etl_spark.sources.parquet import load_table

# --------------------------------------------------------------------------
# item_cooccurrence — market-basket support + lift
# --------------------------------------------------------------------------

MIN_PAIR_SUPPORT = 2


def _baskets(li: DataFrame) -> DataFrame:
    """Distinct (order, part) pairs — the bipartite basket relation."""
    return li.select("l_orderkey", "l_partkey").distinct()


def _copurchase_pairs(li: DataFrame) -> DataFrame:
    """Support-counted unordered part pairs (part_a < part_b) that appear
    in the same order (see ``_copurchase_pairs_from_baskets``)."""
    return _copurchase_pairs_from_baskets(_baskets(li))


def _copurchase_pairs_from_baskets(b: DataFrame) -> DataFrame:
    """The pair build over an already-derived basket relation — split
    out (r18) so ``q_item_cooccurrence`` can feed the SAME checkpointed
    basket table to the pair build and to the item/order marginals
    instead of re-deriving the distinct scan three times.

    Scale shape: one shuffle to ``collect_set`` per order (partial-agg
    combinable), then the pair space is generated INSIDE each basket via
    posexplode × slice — output bounded by Σ |basket|², never a
    part×part self-join. TPC-H baskets are ≤ 13 parts; a real catalog
    caps the basket at top-N items before exploding (same bound the
    AllPairs prefix filter uses in ``ngram_jaccard_dedup``)."""
    baskets = (
        b
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = (
        baskets.select(
            F.posexplode("parts").alias("i", "part_a"), F.col("parts")
        )
        .select(
            "part_a",
            F.explode(
                F.slice("parts", F.col("i") + 2, F.size("parts"))
            ).alias("part_b"),
        )
    )
    return pairs.groupBy("part_a", "part_b").agg(
        F.count("*").alias("pair_cnt")
    )


def _cooccurrence_from_pairs(
    copurchase: DataFrame, b: DataFrame
) -> DataFrame:
    """`item_cooccurrence` downstream of the support-counted pair
    relation — shared by the self-contained registry key and the
    materialized-edge pipeline path (``copurchase_family_from_edges``)."""
    item_cnt = b.groupBy("l_partkey").agg(F.count("*").alias("cnt"))
    n_orders = b.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    pairs = copurchase.filter(
        F.col("pair_cnt") >= MIN_PAIR_SUPPORT
    )
    cnt_a = item_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a")
    )
    cnt_b = item_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(cnt_a), "part_a")
        .join(F.broadcast(cnt_b), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.expr(
                "CAST((CAST(pair_cnt AS DECIMAL(38,0)) * n_orders * 10000)"
                " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)"
            ).alias("lift_bp"),
        )
    )


def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts bought together: pair support ≥ {MIN_PAIR_SUPPORT} plus lift
    in basis points — lift = P(ab) / (P(a)·P(b)) = pair·N / (cnt_a·cnt_b)
    with N = number of baskets.

    lift_bp is exact integral arithmetic: operands widen to
    DECIMAL(38,0) before the multiply (pair·N·10⁴ overflows int64 once
    N > ~10⁹ baskets — the 100 TB case), then one ``div``; the quotient
    itself always fits a long. Item counts are vocabulary-sized and
    broadcast back onto the pair table."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE distinct (order, part) pass: the basket relation feeds the
    # pair build, the item marginals, and the order count — three
    # separate distinct-scan subtrees before this checkpoint (22
    # Exchange / 8 scan static nodes, plans/r18/item_cooccurrence_before
    # .txt; guide §3.3/§5)
    b = _baskets(li).localCheckpoint()
    return _cooccurrence_from_pairs(_copurchase_pairs_from_baskets(b), b)


ORACLE_ITEM_COOCCURRENCE = f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
    ic AS (SELECT l_partkey, COUNT(*) AS cnt FROM b GROUP BY l_partkey),
    p AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
               COUNT(*) AS pair_cnt
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    )
    SELECT p.part_a, p.part_b, p.pair_cnt,
           a.cnt AS cnt_a, c.cnt AS cnt_b,
           CAST((p.pair_cnt::HUGEINT * n.n_orders * 10000)
                // (a.cnt::HUGEINT * c.cnt) AS BIGINT) AS lift_bp
    FROM p
    JOIN ic a ON p.part_a = a.l_partkey
    JOIN ic c ON p.part_b = c.l_partkey
    CROSS JOIN n
"""


# --------------------------------------------------------------------------
# pagerank_copurchase — fixed-iteration integer PageRank
# --------------------------------------------------------------------------

PR_ITERATIONS = 3
PR_UNIT = 1_000_000_000  # initial rank per node, integer units
PR_TELEPORT = PR_UNIT * 15 // 100  # 0.15 · unit, exact
PR_TOPK = 100


def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the co-purchase graph (edges = part pairs
    with support ≥ {MIN_PAIR_SUPPORT}, symmetric), {PR_ITERATIONS} fixed
    iterations, damping 0.85, un-normalized per-node teleport:

        r₀(v) = U;  rₖ₊₁(v) = 0.15·U + (85 · Σ_{{u→v}} (rₖ(u) div deg(u))) div 100

    All-integer recurrence → the ranking is bit-reproducible (no float
    accumulation order anywhere), and the multiply widens to
    DECIMAL(38,0) first because a hub's inbound sum approaches total
    graph mass n·U, which clears int64 at n ≈ 10⁹ nodes. Symmetric
    edges mean deg ≥ 1 for every node in the graph — no dangling mass.

    Scale shape per iteration: one equi-join of the skinny rank table
    onto edges (co-partitioned on the same key across iterations) plus
    one map-side-combinable groupBy — the classic Pregel step expressed
    relationally; the fixed iteration count keeps the lineage O(1)
    without checkpointing."""
    li = load_table(spark, sf_dir, "lineitem")
    return _pagerank_from_pairs(_copurchase_pairs(li))


def _pagerank_from_pairs(copurchase: DataFrame) -> DataFrame:
    """`pagerank_copurchase` downstream of the pair relation (shared
    with the materialized-edge pipeline path)."""
    e = copurchase.filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
    return (
        pagerank_fixed(e, iterations=PR_ITERATIONS, unit=PR_UNIT)
        .orderBy(F.col("rank_units").desc(), F.col("part"))
        .limit(PR_TOPK)
    )


def _sql_pr_iter(prev: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT s.dst AS src,
               CAST({PR_TELEPORT} + (85 * SUM(r.rank::HUGEINT // d.deg))
                    // 100 AS BIGINT) AS rank
        FROM sym s JOIN {prev} r ON s.src = r.src
                   JOIN deg d ON s.src = d.src
        GROUP BY s.dst
    )"""


ORACLE_PAGERANK = f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT x.l_partkey AS part_a, y.l_partkey AS part_b
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ),
    sym AS (
        SELECT part_a AS src, part_b AS dst FROM p
        UNION ALL
        SELECT part_b AS src, part_a AS dst FROM p
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
    r0 AS (SELECT src, {PR_UNIT}::BIGINT AS rank FROM deg),
    {_sql_pr_iter("r0", "r1")},
    {_sql_pr_iter("r1", "r2")},
    {_sql_pr_iter("r2", "r3")}
    SELECT src AS part, rank AS rank_units
    FROM r3 ORDER BY rank DESC, part LIMIT {PR_TOPK}
"""


# --------------------------------------------------------------------------
# snapshot_diff — CDC reconciliation between two warehouse snapshots
# --------------------------------------------------------------------------

SNAP_D1 = "1995-06-01"
SNAP_D2 = "1996-06-01"


def _order_state(li: DataFrame, cutoff: str) -> DataFrame:
    """Per-order aggregate state as shipped by ``cutoff`` — line count,
    exact integer quantity, exact price cents — plus an md5 fingerprint
    of the state tuple. The fingerprint is what ships between sites in a
    real reconciliation: one 16-byte hash per key instead of the row."""
    st = (
        li.filter(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.floor("l_quantity").cast("long")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
    )
    return st.withColumn(
        "fp",
        F.md5(
            F.concat_ws(
                "|",
                F.col("n_lines").cast("string"),
                F.col("qty").cast("string"),
                F.col("price_cents").cast("string"),
            )
        ),
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff between the order-state snapshot at {SNAP_D1} and at
    {SNAP_D2}: full-outer join on the key, classify each key as
    ``added`` / ``removed`` / ``changed`` by comparing the state
    FINGERPRINTS, emit only the delta (unchanged keys drop out — the
    CDC contract). Ship-date monotonicity means ``removed`` is empty
    here; the branch is still real code because a compaction or GDPR
    delete produces it in production.

    Scale shape: both snapshots aggregate map-side-combinably on the
    same key, the outer join co-partitions on that key (one shuffle
    each side), and the compared payload is one 16-byte hash per key —
    the bucketed-layout version of this join is zero-shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return classify_snapshot_diff(
        _order_state(li, SNAP_D1), _order_state(li, SNAP_D2), "l_orderkey"
    )


def _sql_order_state(cutoff: str) -> str:
    return f"""
        SELECT l_orderkey, COUNT(*) AS n_lines,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS price_cents,
               md5(COUNT(*)::VARCHAR || '|' ||
                   CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)::VARCHAR
                   || '|' ||
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)::VARCHAR)
                   AS fp
        FROM lineitem WHERE l_shipdate < TIMESTAMP '{cutoff} 00:00:00'
        GROUP BY l_orderkey
    """


ORACLE_SNAPSHOT_DIFF = f"""
    WITH a AS ({_sql_order_state(SNAP_D1)}), b AS ({_sql_order_state(SNAP_D2)})
    SELECT COALESCE(a.l_orderkey, b.l_orderkey) AS l_orderkey,
           CASE WHEN a.l_orderkey IS NULL THEN 'added'
                WHEN b.l_orderkey IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS status,
           a.n_lines AS n_lines_old, b.n_lines AS n_lines_new,
           a.qty AS qty_old, b.qty AS qty_new,
           a.price_cents AS price_cents_old, b.price_cents AS price_cents_new
    FROM a FULL OUTER JOIN b ON a.l_orderkey = b.l_orderkey
    WHERE CASE WHEN a.l_orderkey IS NULL THEN 'added'
               WHEN b.l_orderkey IS NULL THEN 'removed'
               WHEN a.fp <> b.fp THEN 'changed'
               ELSE 'unchanged' END <> 'unchanged'
"""


# --------------------------------------------------------------------------
# bm25_topk — BM25 ranked retrieval over documents
# --------------------------------------------------------------------------

BM25_TERMS = ("vector", "merge", "window", "hash")
BM25_TOPK = 20
# k1 = 1.2, b = 0.75 multiplied out to one integer fraction:
#   tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
#     = 22·tf·L / (10·tf·L + 3·L + 9·dl·N)      with avgdl = L/N


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{BM25_TOPK} over ``documents`` for the fixed query
    {BM25_TERMS} (k1=1.2, b=0.75). The Robertson idf
    ln(1 + (N−df+0.5)/(df+0.5)) integerizes to micro-nats per DISTINCT
    term (the ``unigram_logprob`` convention — the double both engines
    take ln of is constructed by the identical expression), and the tf
    normalization is multiplied out to ONE integer fraction so each
    per-term contribution is a single exact integral ``div`` on
    DECIMAL(38,0) operands (idf·22·tf·L clears int64 once the corpus
    passes ~10¹³ tokens).

    Scale shape: doc lengths are a zero-shuffle map; tf for the query
    terms is one combinable groupBy over the filtered token stream
    (the IN-list prunes before the explode's shuffle); df and the
    corpus totals are O(|query|) and broadcast; one final groupBy on
    doc_id + TakeOrdered for the top-k. No inverted index is needed for
    a fixed query — the scan IS the index probe; the materialized
    inverted layout is the same bucket-by-term step SCALE.md describes
    for the MinHash band index."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    corpus = toks.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    # read by the document-frequency aggregate AND the scoring join —
    # un-materialized, each reference re-exploded and re-filtered the
    # corpus token stream; bounded by (matching docs × query terms), so
    # the checkpoint is tiny (guide §3.3)
    tf = (
        toks.select("doc_id", "dl", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    df_tbl = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = (
        df_tbl.crossJoin(F.broadcast(corpus))
        .select(
            "tok",
            "n_docs",
            "total_len",
            F.round(
                F.log(
                    (
                        (2 * (F.col("n_docs") - F.col("df")) + 1).cast("double")
                        / (2 * F.col("df") + 1).cast("double")
                    )
                    + F.lit(1.0)
                )
                * 1_000_000
            )
            .cast("long")
            .alias("idf_unat"),
        )
    )
    scored = tf.join(F.broadcast(idf), "tok").select(
        "doc_id",
        F.expr(
            "CAST((CAST(idf_unat AS DECIMAL(38,0)) * 22 * tf * total_len)"
            " div (CAST(10 AS DECIMAL(38,0)) * tf * total_len"
            "      + 3 * total_len + CAST(9 AS DECIMAL(38,0)) * dl * n_docs)"
            " AS BIGINT)"
        ).alias("contrib_unat"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("contrib_unat").alias("score_unat"),
        )
        .orderBy(F.col("score_unat").desc(), F.col("doc_id"))
        .limit(BM25_TOPK)
    )


_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)


ORACLE_BM25 = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    corpus AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM toks),
    tf AS (
        SELECT doc_id, dl, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(t) AS tok FROM toks)
        WHERE tok IN ({_BM25_IN})
        GROUP BY doc_id, dl, tok
    ),
    dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    idf AS (
        SELECT tok, n_docs, total_len,
               CAST(ROUND(ln((CAST(2 * (n_docs - df) + 1 AS DOUBLE)
                              / CAST(2 * df + 1 AS DOUBLE)) + 1.0)
                          * 1000000) AS BIGINT) AS idf_unat
        FROM dft CROSS JOIN corpus
    ),
    scored AS (
        SELECT tf.doc_id,
               CAST((idf.idf_unat::HUGEINT * 22 * tf.tf * idf.total_len)
                    // (10::HUGEINT * tf.tf * idf.total_len
                        + 3 * idf.total_len
                        + 9::HUGEINT * tf.dl * idf.n_docs) AS BIGINT)
                   AS contrib_unat
        FROM tf JOIN idf ON tf.tok = idf.tok
    )
    SELECT doc_id, COUNT(*) AS n_terms_hit,
           CAST(SUM(contrib_unat) AS BIGINT) AS score_unat
    FROM scored GROUP BY doc_id
    ORDER BY score_unat DESC, doc_id LIMIT {BM25_TOPK}
"""


# --------------------------------------------------------------------------
# triangle_count — degree-oriented triangle counting on the co-purchase graph
# --------------------------------------------------------------------------

TRIANGLE_TOPK = 50


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the support-≥2 co-purchase
    graph (the clustering/community signal on the "bought together"
    relation), top {TRIANGLE_TOPK} nodes.

    Algorithm: degree-ordered orientation (Cohen, "Graph Twiddling in a
    MapReduce World", 2009) — orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges by
    self-joining oriented edges on their source, and close each wedge
    with one more equi-join. Each triangle is found EXACTLY once, and
    the wedge count is Σ out-deg² where out-degree is bounded by
    O(√m) under this orientation — the property that keeps the
    intermediate from exploding on skewed (popular-product) nodes at
    100 TB, where orienting by raw id would give a hub node a wedge set
    quadratic in its full degree.

    The orientation key packs (degree, id) into one int64
    (deg·2³² + id) so joins and comparisons stay single-column. All
    joins are equi-joins on ids; the degree table joins back onto the
    edge list at node cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    return _triangle_from_pairs(_copurchase_pairs(li))


def _triangle_from_pairs(copurchase: DataFrame) -> DataFrame:
    """`triangle_count` downstream of the pair relation (shared with
    the materialized-edge pipeline path)."""
    edges = (
        copurchase
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
    )
    deg = (
        edges.select(F.col("part_a").alias("node"))
        .unionAll(edges.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    keyed = (
        edges.join(deg.withColumnRenamed("node", "part_a"), "part_a")
        .withColumnRenamed("d", "da")
        .join(
            deg.withColumnRenamed("node", "part_b").withColumnRenamed(
                "d", "db"
            ),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            (F.col("da") * F.lit(4294967296) + F.col("part_a")).alias("ka"),
            (F.col("db") * F.lit(4294967296) + F.col("part_b")).alias("kb"),
        )
    )
    # The oriented edge list feeds BOTH wedge sides and the closing
    # semi-join — 3 references. Un-materialized, the static plan expanded
    # the whole pair-build+degree+orientation subtree into each (measured
    # 266 Exchange / 90 scan nodes at sf0.1 —
    # plans/r18/triangle_count_before.txt), recomputation guarded only by
    # runtime exchange reuse. One localCheckpoint of the O(E) oriented
    # relation (the same bound CC's edge checkpoint already accepts) makes
    # the one-pass pair build structural (guide §3.3/§5). Blocks stay
    # alive — the returned plan reads them (standalone-key lifetime
    # contract).
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("part_a"))
        .otherwise(F.col("part_b"))
        .alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("part_b"))
        .otherwise(F.col("part_a"))
        .alias("dst"),
        F.greatest("ka", "kb").alias("dst_k"),
    ).localCheckpoint()
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst_k") < F.col("o2.dst_k")),
    ).select(
        F.col("o1.src").alias("u"),
        F.col("o1.dst").alias("v"),
        F.col("o2.dst").alias("w"),
    )
    closer = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closer, ["v", "w"], "left_semi")
    nodes = (
        tri.select(F.col("u").alias("part_id"))
        .unionAll(tri.select(F.col("v").alias("part_id")))
        .unionAll(tri.select(F.col("w").alias("part_id")))
    )
    return (
        nodes.groupBy("part_id")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "part_id")
        .limit(TRIANGLE_TOPK)
    )


ORACLE_TRIANGLE_COUNT = f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {{MIN_PAIR_SUPPORT}}
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT pa AS node FROM pairs
            UNION ALL SELECT pb FROM pairs
        ) GROUP BY node
    ),
    keyed AS (
        SELECT pa, pb,
               da.d * 4294967296 + pa AS ka,
               db.d * 4294967296 + pb AS kb
        FROM pairs
        JOIN deg da ON da.node = pa
        JOIN deg db ON db.node = pb
    ),
    o AS (
        SELECT CASE WHEN ka < kb THEN pa ELSE pb END AS src,
               CASE WHEN ka < kb THEN pb ELSE pa END AS dst,
               CASE WHEN ka < kb THEN kb ELSE ka END AS dst_k
        FROM keyed
    ),
    tri AS (
        SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
        FROM o o1 JOIN o o2
          ON o1.src = o2.src AND o1.dst_k < o2.dst_k
        WHERE EXISTS (SELECT 1 FROM o e
                      WHERE e.src = o1.dst AND e.dst = o2.dst)
    )
    SELECT part_id, COUNT(*) AS n_triangles FROM (
        SELECT u AS part_id FROM tri
        UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri
    )
    GROUP BY part_id
    ORDER BY n_triangles DESC, part_id
    LIMIT {{TRIANGLE_TOPK}}
""".format(MIN_PAIR_SUPPORT=MIN_PAIR_SUPPORT, TRIANGLE_TOPK=TRIANGLE_TOPK)


# --------------------------------------------------------------------------
# node_jaccard_linkpred — neighborhood-Jaccard link prediction
# --------------------------------------------------------------------------

LINKPRED_TOPK = 100


def q_node_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: for node pairs that are
    NOT edges but share at least one neighbor, the Jaccard similarity of
    their neighborhoods — |N(a)∩N(b)| div |N(a)∪N(b)| in basis points —
    top {LINKPRED_TOPK} predicted links (the classic "customers who
    bought these also buy together" recommender signal).

    Scale: candidate pairs are generated INSIDE each center node's
    sorted adjacency list (posexplode × slice, the `item_cooccurrence`
    basket pattern) — wedge volume is Σ deg(u)², never a node×node
    cross join, and a production run caps hub adjacency at top-N
    neighbors exactly like the basket cap. Common-neighbor counts are
    one combinable groupBy; the existing-edge anti-join and the two
    degree joins are equi-joins on node ids; the union size needs no
    second pass (|∪| = d_a + d_b − cn). Exact integral arithmetic
    throughout; the top-k order (jaccard_bp DESC, part_a, part_b) is
    unique."""
    li = load_table(spark, sf_dir, "lineitem")
    return _jaccard_from_pairs(_copurchase_pairs(li))


def _jaccard_from_pairs(copurchase: DataFrame) -> DataFrame:
    """`node_jaccard_linkpred` downstream of the pair relation (shared
    with the materialized-edge pipeline path)."""
    # The support-filtered edge list feeds the degree table, the adjacency
    # table AND the existing-edge anti-join — un-materialized, the static
    # plan expanded the pair build into each reference (42 Exchange / 14
    # scan nodes at sf0.1 — plans/r18/node_jaccard_linkpred_before.txt).
    # One localCheckpoint of the O(E) relation (CC's edge-checkpoint
    # bound) makes the one-pass pair build structural (guide §3.3/§5);
    # blocks stay alive — the returned plan reads them.
    edges = (
        copurchase
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
        .localCheckpoint()
    )
    sym = edges.select(
        F.col("part_a").alias("node"), F.col("part_b").alias("nbr")
    ).unionAll(
        edges.select(F.col("part_b").alias("node"), F.col("part_a").alias("nbr"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("d"))
    adj = sym.groupBy("node").agg(
        F.sort_array(F.collect_set("nbr")).alias("nbrs")
    )
    cand = (
        adj.select(F.posexplode("nbrs").alias("i", "part_a"), "nbrs")
        .select(
            "part_a",
            F.explode(
                F.slice("nbrs", F.col("i") + 2, F.size("nbrs"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("cn"))
        .join(edges, ["part_a", "part_b"], "left_anti")
    )
    da = deg.select(F.col("node").alias("part_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("node").alias("part_b"), F.col("d").alias("deg_b"))
    return (
        cand.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "cn",
            "deg_a",
            "deg_b",
            F.expr("(cn * 10000) div (deg_a + deg_b - cn)").alias(
                "jaccard_bp"
            ),
        )
        .orderBy(F.desc("jaccard_bp"), "part_a", "part_b")
        .limit(LINKPRED_TOPK)
    )


ORACLE_NODE_JACCARD = """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {sup}
    ),
    sym AS (
        SELECT pa AS node, pb AS nbr FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
    ),
    deg AS (SELECT node, COUNT(*) AS d FROM sym GROUP BY node),
    cand AS (
        SELECT s1.nbr AS part_a, s2.nbr AS part_b, COUNT(*) AS cn
        FROM sym s1 JOIN sym s2
          ON s1.node = s2.node AND s1.nbr < s2.nbr
        GROUP BY 1, 2
    ),
    non_edges AS (
        SELECT * FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM pairs p
                          WHERE p.pa = c.part_a AND p.pb = c.part_b)
    )
    SELECT part_a, part_b, cn, da.d AS deg_a, db.d AS deg_b,
           (cn * 10000) // (da.d + db.d - cn) AS jaccard_bp
    FROM non_edges
    JOIN deg da ON da.node = part_a
    JOIN deg db ON db.node = part_b
    ORDER BY jaccard_bp DESC, part_a, part_b
    LIMIT {topk}
""".format(sup=MIN_PAIR_SUPPORT, topk=LINKPRED_TOPK)


# --------------------------------------------------------------------------
# entity_resolution_blocked — edit-distance record linkage with blocking
# --------------------------------------------------------------------------

ER_MAX_LEV = 3


def q_entity_resolution_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entity resolution: candidate duplicate part-name pairs
    with Levenshtein distance ≤ {ER_MAX_LEV}, blocked on the name's
    head noun (its last token) so only plausibly-same entities are ever
    compared — the standard blocking + pairwise-similarity record
    linkage shape (Fellegi–Sunter with a single edit-distance field).

    Scale: the pairwise space is built over the DISTINCT-name relation
    — vocabulary-sized, not row-sized; a 100 TB catalog still has a
    bounded name vocabulary — and pairs form only WITHIN a block via an
    equi-join on the blocking key, never name×name. Each candidate
    name carries its support (how many rows hold it) so downstream
    merge decisions can weight by evidence. Levenshtein is exact
    integer and identical across engines. Pair order (name_a < name_b)
    makes the result a deterministic set."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .select(
            F.col("p_name").alias("name"),
            "n_parts",
            F.element_at(F.split("p_name", " "), -1).alias("blk"),
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").cast("long").alias("lev"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
        .filter(F.col("lev") <= ER_MAX_LEV)
    )


ORACLE_ENTITY_RESOLUTION = f"""
    WITH names AS (
        SELECT p_name AS name, COUNT(*) AS n_parts,
               split_part(p_name, ' ', -1) AS blk
        FROM part GROUP BY p_name
    )
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {ER_MAX_LEV}
"""


# --------------------------------------------------------------------------
# khop_reach — bounded BFS over the co-purchase graph
# --------------------------------------------------------------------------

KHOP_MAX = 3
KHOP_SEED_MOD = 500  # seeds: part keys divisible by this


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first reach: every part within {KHOP_MAX} hops of
    the seed set (keys ≡ 0 mod {KHOP_SEED_MOD}) on the support-≥2
    co-purchase graph, labeled with its minimum hop count — the
    "related products within N clicks" / blast-radius traversal.

    Scale: the textbook frontier BFS as DataFrame rounds — per hop ONE
    equi-join of the (skinny) frontier onto the symmetric edge list
    keyed on src, then an anti-join against the visited set so the
    frontier only carries NEW nodes (state is O(reached), never
    O(reached·hops)). Each round's visited/frontier pair is
    localCheckpoint-ed with superseded generations released
    (operators/checkpoint.py), the same O(1)-lineage discipline as the
    CC loops. Hop count is bounded (not run-to-fixpoint), which is what
    keeps the traversal predictable on a 100 TB graph — unbounded reach
    on a connected component is the whole graph."""
    li = load_table(spark, sf_dir, "lineitem")
    return _khop_from_pairs(spark, _copurchase_pairs(li))


def _khop_from_pairs(spark: SparkSession, copurchase: DataFrame) -> DataFrame:
    """`khop_reach` downstream of the pair relation (shared with the
    materialized-edge pipeline path)."""
    from imperio_patitas_etl_spark.operators.checkpoint import (
        CheckpointGenerations,
        persistent_rdd_ids,
        release_rdds,
    )

    edges = (
        copurchase
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
    )
    # The symmetric edge list is read by the seed scan AND by every hop's
    # frontier join — 1 + KHOP_MAX references. Un-checkpointed, each one
    # re-derived the whole co-purchase pair build (basket collect_set +
    # intra-basket explode + pair groupBy) from the parquet scan: 4 full
    # pipeline runs per call at KHOP_MAX=3, measured 4.6 s → 2.x s warm at
    # sf0.1 (guide §2.4/§5 — reuse demands materialization; Catalyst does
    # not CSE across DataFrame references, and only the loop's OWN rounds
    # were checkpointed, same lesson as connected_components' edge set).
    # Checkpointed BEFORE generation tracking starts (the
    # CheckpointGenerations contract above) and released once the loop's
    # final visited checkpoint no longer reads it.
    _before_sym = persistent_rdd_ids(spark)
    sym = edges.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst")
    ).unionAll(
        edges.select(F.col("part_b").alias("src"), F.col("part_a").alias("dst"))
    ).localCheckpoint()
    _sym_ids = persistent_rdd_ids(spark) - _before_sym
    nodes = sym.select("src").distinct()
    gens = CheckpointGenerations(spark)
    frontier = (
        nodes.filter(F.col("src") % KHOP_SEED_MOD == 0)
        .select("src", F.lit(0).cast("long").alias("hops"))
        .localCheckpoint()
    )
    gens.mark()
    visited = frontier
    for hop in range(1, KHOP_MAX + 1):
        nxt = (
            sym.join(frontier.select("src"), "src")
            .select(F.col("dst").alias("src"))
            .distinct()
            .join(visited.select("src"), "src", "left_anti")
            .select("src", F.lit(hop).cast("long").alias("hops"))
        )
        visited = visited.unionAll(nxt).localCheckpoint()
        gens.mark()
        gens.release_previous()
        # re-derive the frontier FROM the new checkpoint — keeping `nxt`
        # would lazily reference the generation just released
        frontier = visited.filter(F.col("hops") == hop)
    # the returned plan reads only the final visited checkpoint — the
    # edge blocks are dead here
    release_rdds(spark, _sym_ids)
    return visited.select(F.col("src").alias("part_id"), "hops")


ORACLE_KHOP = f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT x.l_partkey AS pa, y.l_partkey AS pb
        FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_SUPPORT}
    ),
    sym AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
    ),
    h0 AS (SELECT DISTINCT src FROM sym WHERE src % {KHOP_SEED_MOD} = 0),
    h1 AS (SELECT DISTINCT dst AS src FROM sym JOIN h0 USING (src)),
    h2 AS (SELECT DISTINCT dst AS src FROM sym JOIN h1 USING (src)),
    h3 AS (SELECT DISTINCT dst AS src FROM sym JOIN h2 USING (src)),
    lev AS (
        SELECT src, 0 AS hops FROM h0
        UNION ALL SELECT src, 1 FROM h1
        UNION ALL SELECT src, 2 FROM h2
        UNION ALL SELECT src, 3 FROM h3
    )
    SELECT src AS part_id, CAST(MIN(hops) AS BIGINT) AS hops
    FROM lev GROUP BY src
"""


# --------------------------------------------------------------------------
# ndcg_eval — exact-integer ranking-quality evaluation of the BM25 run
# --------------------------------------------------------------------------

#: position-discount weights round(10⁶ / log2(i+1)), i = 1..k —
#: precomputed in Python so BOTH engines consume identical integer
#: literals and the whole DCG fold is exact integer arithmetic
_NDCG_W = tuple(
    round(1_000_000 / __import__("math").log2(i + 1))
    for i in range(1, BM25_TOPK + 1)
)
NDCG_REL_CAP = 3


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{BM25_TOPK} of the BM25 ranking — the evaluation-harness
    convention (``ann_recall``, ``cosine_dedup_recall``): retrieval
    quality is a measured, oracle-checked number, not a claim. Graded
    relevance is INDEPENDENT of the score being judged — rel(doc) =
    min(total query-term occurrences, {NDCG_REL_CAP}) — so the metric
    can actually fall if the ranker misorders.

    Exactness: the position discounts 1/log2(i+1) are the ONLY
    irrational inputs, and they depend on nothing but the rank — so
    they are precomputed in Python as micro-unit INTEGER literals
    shared verbatim by both engines; DCG and ideal-DCG are then exact
    integer dot products over deterministic (score desc, doc_id) /
    (rel desc, doc_id) orders, and NDCG publishes as one integral
    basis-point division.

    Scale shape: relevance is one combinable groupBy over the filtered
    token stream; both the run and the ideal ranking are
    TakeOrdered-{BM25_TOPK} heads; the final fold is {BM25_TOPK} rows."""
    d = load_table(spark, sf_dir, "documents")
    # read by the run join AND the ideal ranking — un-materialized, each
    # reference re-exploded the corpus token stream (22 Exchange / 10
    # scan static nodes, plans/r18/ndcg_eval_before.txt); the relevance
    # table is bounded by docs containing query terms, so the
    # checkpoint is tiny (guide §3.3)
    rel = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.least(F.count("*"), F.lit(NDCG_REL_CAP)).alias("rel"))
        .localCheckpoint()
    )
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    run = (
        q_bm25_topk(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_unat"), "doc_id"))
            .alias("rank"),
        )
        .join(rel, "doc_id", "left")
        .select(
            (F.coalesce("rel", F.lit(0)) * F.element_at(w_arr, F.col("rank")))
            .alias("gain")
        )
    )
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(BM25_TOPK)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("rel"), "doc_id"))
            .alias("rank"),
            "rel",
        )
        .select((F.col("rel") * F.element_at(w_arr, F.col("rank"))).alias("gain"))
    )
    dcg = run.agg(F.sum("gain").alias("dcg_micro"))
    idcg = ideal.agg(F.sum("gain").alias("idcg_micro"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "dcg_micro",
        "idcg_micro",
        F.expr("CAST(dcg_micro * 10000 div idcg_micro AS BIGINT)").alias(
            "ndcg_bp"
        ),
    )


_NDCG_W_VALUES = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))

ORACLE_NDCG = f"""
    WITH rel AS (
        SELECT doc_id, LEAST(COUNT(*), {NDCG_REL_CAP}) AS rel
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok IN ({_BM25_IN})
        GROUP BY doc_id
    ), w(rank, wt) AS (VALUES {_NDCG_W_VALUES}),
    run AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_unat DESC, doc_id) AS rank
        FROM ({ORACLE_BM25})
    ), dcg AS (
        SELECT CAST(SUM(COALESCE(rel.rel, 0) * w.wt) AS BIGINT) AS dcg_micro
        FROM run
        JOIN w USING (rank)
        LEFT JOIN rel USING (doc_id)
    ), ideal AS (
        SELECT ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank, rel
        FROM rel ORDER BY rel DESC, doc_id LIMIT {BM25_TOPK}
    ), idcg AS (
        SELECT CAST(SUM(ideal.rel * w.wt) AS BIGINT) AS idcg_micro
        FROM ideal JOIN w USING (rank)
    )
    SELECT dcg_micro, idcg_micro,
           CAST(dcg_micro * 10000 // idcg_micro AS BIGINT) AS ndcg_bp
    FROM dcg CROSS JOIN idcg
"""


QUERIES = {
    "item_cooccurrence": q_item_cooccurrence,
    "pagerank_copurchase": q_pagerank_copurchase,
    "snapshot_diff": q_snapshot_diff,
    "bm25_topk": q_bm25_topk,
    "triangle_count": q_triangle_count,
    "node_jaccard_linkpred": q_node_jaccard_linkpred,
    "entity_resolution_blocked": q_entity_resolution_blocked,
    "khop_reach": q_khop_reach,
    "ndcg_eval": q_ndcg_eval,
}

ORACLE = {
    "item_cooccurrence": ORACLE_ITEM_COOCCURRENCE,
    "pagerank_copurchase": ORACLE_PAGERANK,
    "snapshot_diff": ORACLE_SNAPSHOT_DIFF,
    "bm25_topk": ORACLE_BM25,
    "triangle_count": ORACLE_TRIANGLE_COUNT,
    "node_jaccard_linkpred": ORACLE_NODE_JACCARD,
    "entity_resolution_blocked": ORACLE_ENTITY_RESOLUTION,
    "khop_reach": ORACLE_KHOP,
    "ndcg_eval": ORACLE_NDCG,
}


# --------------------------------------------------------------------------
# materialized edge table — the pipeline shape for the co-purchase family
# --------------------------------------------------------------------------

#: field-metadata key recording which sf_dir an edge table was built from
_EDGE_SOURCE_KEY = "copurchase_edge_source_sf_dir"


def materialize_edge_table(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Write the support-counted co-purchase pair relation
    (part_a, part_b, pair_cnt) to ``path`` — the storage-layout step for
    the five graph-family consumers, mirroring the ANN tier's
    ``materialize_cell_layout`` (queries/vector.py).

    Every registry key stays self-contained (rebuilds the pairs from
    lineitem — the benchmark shape, each key its own DuckDB oracle); a
    real pipeline pays the basket explode + pair groupBy ONCE at write
    time and the whole family reads the result as a table.
    ``tools/shared_build_probe.py`` measured the family total 10.7 →
    4.9 s at sf0.1 on this path (BASELINE.md §r9). At 100 TB this is the
    difference between five full lineitem scans and one: the edge table
    is orders of magnitude smaller than its source (bounded by
    Σ |basket|² distinct pairs), so downstream reads are cheap scans of
    an already-aggregated relation.

    The table carries its source ``sf_dir`` as field metadata on
    ``part_a`` (operators/provenance.py, one contract across all three
    materialized product tables) so ``copurchase_family_from_edges``
    can refuse a table materialized from a DIFFERENT source —
    ``item_cooccurrence`` mixes the edge relation with basket statistics
    rebuilt from ``sf_dir``, and a silent source mismatch would corrupt
    lift_bp (ADVICE r10)."""
    li = load_table(spark, sf_dir, "lineitem")
    tag_source(
        _copurchase_pairs(li), "part_a", _EDGE_SOURCE_KEY, sf_dir
    ).write.mode("overwrite").parquet(path)


def retag_edge_table(spark: SparkSession, sf_dir: str, path: str) -> bool:
    """Upgrade a pre-r12 raw-string-tagged edge table at ``path`` to the
    strict realpath tag by rebuilding it once from ``sf_dir`` — the
    documented exit path from ``allow_legacy_tag=True`` on
    ``copurchase_family_from_edges`` (operators/provenance.py:retag_table
    for semantics: idempotent on strict tables, refuses genuine
    mismatches). Returns True iff a rebuild happened."""
    return retag_table(
        spark,
        sf_dir,
        path,
        column="part_a",
        key=_EDGE_SOURCE_KEY,
        table_desc="edge table",
        rebuild=materialize_edge_table,
    )


def copurchase_family_from_edges(
    spark: SparkSession,
    sf_dir: str,
    edge_path: str,
    *,
    allow_legacy_tag: bool = False,
) -> "CopurchaseFamily":
    """The five co-purchase family results computed FROM a materialized
    edge table (``materialize_edge_table``) instead of from lineitem —
    identical downstream plans (asserted row-equal to the registry keys
    in tests/test_affinity_edge_table.py); only the pair-build subtree
    is replaced by a parquet scan. ``item_cooccurrence`` still reads
    lineitem for its basket-count statistics (node-cardinality
    aggregates, cheap next to the pair build) — so the edge table MUST
    have been materialized from the SAME ``sf_dir``, or lift_bp would
    silently mix inconsistent inputs. The provenance tag
    ``materialize_edge_table`` embeds in the table's field metadata is
    validated here; a missing or mismatched tag raises (ADVICE r10).
    ``allow_legacy_tag=True`` opts in to the weaker pre-r12 raw-string
    tag compare for tables materialized before r12 (ADVICE r13: the
    fallback is caller-visible, never the default).

    The returned mapping is a :class:`CopurchaseFamily` — a plain dict
    plus a ``release()`` method (VERDICT r12 item 4: uniform lifetime
    contracts across the family product APIs). Two builders checkpoint
    eagerly at construction time — khop's BFS retains its final visited
    generation and pagerank its one-time symmetric-edge checkpoint;
    without the handle those blocks had session lifetime, additive
    across invocations — the same shape ``NgramFamily`` fixed for the
    ngram pipeline."""
    pairs = spark.read.parquet(edge_path)
    require_source(
        pairs,
        "part_a",
        _EDGE_SOURCE_KEY,
        sf_dir,
        table_desc="edge table",
        path=edge_path,
        consequence=(
            "item_cooccurrence would mix basket statistics from one "
            "source with edges from another"
        ),
        rebuild="materialize_edge_table(spark, sf_dir, path)",
        allow_legacy_tag=allow_legacy_tag,
    )
    li = load_table(spark, sf_dir, "lineitem")
    # Snapshot-diff ownership (the OwnedFamily construction contract):
    # two builders checkpoint eagerly at construction time — khop's BFS
    # loop (CheckpointGenerations free superseded rounds but retain the
    # final visited generation) and pagerank_fixed's one-time symmetric
    # edge checkpoint; the other three are pure lazy plans. All
    # checkpointing is eager, no lazy .persist() anywhere in the build,
    # so the post-build diff is complete by construction.
    _before = persistent_rdd_ids(spark)
    family = {
        "item_cooccurrence": _cooccurrence_from_pairs(pairs, _baskets(li)),
        "pagerank_copurchase": _pagerank_from_pairs(pairs),
        "triangle_count": _triangle_from_pairs(pairs),
        "node_jaccard_linkpred": _jaccard_from_pairs(pairs),
        "khop_reach": _khop_from_pairs(spark, pairs),
    }
    return CopurchaseFamily(family, spark, persistent_rdd_ids(spark) - _before)


class CopurchaseFamily(OwnedFamily):
    """The five co-purchase family DataFrames keyed by registry name,
    plus ownership of every checkpoint block the build retains: the
    khop BFS's final visited generation and pagerank's one-time
    symmetric-edge checkpoint. Lifetime contract:
    :class:`operators.checkpoint.OwnedFamily` — the same owned-release
    shape as ``NgramFamily`` (VERDICT r12 item 4)."""
