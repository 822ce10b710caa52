"""Semantic invariants of the r7c scan/statistics tier: the two-phase
distributed prefix sum (operators/prefix_sum.py) and the queries built on
it (pps_systematic_sample, equi_depth_histogram), plus the time-spine
resample, incremental aggregate maintenance, sliding distinct users,
degree-oriented triangle counting, PMI collocations, and min-max feature
scaling. Cross-engine value equality is tools/check.py's job; these pin
the properties the oracle can't see (plan shape, operator-level algebra,
distribution-independence of the scan).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from imperio_patitas_etl_spark.operators.prefix_sum import (
    partitioned_prefix_sum,
)
from imperio_patitas_etl_spark.queries.affinity import q_triangle_count
from imperio_patitas_etl_spark.queries.analytics import (
    q_incremental_agg_merge,
    q_resample_ffill,
    q_rolling_distinct_users,
    ROLLING_WINDOW_DAYS,
)
from imperio_patitas_etl_spark.queries.core import (
    EQUI_DEPTH_BUCKETS,
    q_equi_depth_histogram,
)
from imperio_patitas_etl_spark.queries.corpus import (
    PPS_K,
    q_pps_systematic_sample,
)
from imperio_patitas_etl_spark.queries.text import (
    PMI_MIN_COUNT,
    q_pmi_collocations,
)
from imperio_patitas_etl_spark.queries.vector import (
    FEATURE_SCALE_DIMS,
    q_feature_scale,
)


# ---------------------------------------------------------------- prefix sum


def _prefix_fixture(spark, n_rows=400, n_strata=3):
    rows = [
        (f"s{i % n_strata}", i, (i * 7919) % 13 + 1) for i in range(n_rows)
    ]
    return spark.createDataFrame(rows, "stratum string, k long, v long")


def test_prefix_sum_equals_window_cumsum(spark):
    df = _prefix_fixture(spark)
    got = partitioned_prefix_sum(df, "stratum", ["k"], "v", "cum", 8)
    w = (
        Window.partitionBy("stratum")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_prefix_sum_single_stratum_spans_partitions(spark):
    # ONE stratum forced across 8 range partitions — the case a
    # Window.partitionBy would serialize and the scan must still get
    # exactly right (offsets accumulate across every partition).
    df = spark.range(1000).select(
        F.lit("only").alias("stratum"),
        F.col("id").alias("k"),
        (F.col("id") % 5 + 1).alias("v"),
    )
    got = partitioned_prefix_sum(df, "stratum", ["k"], "v", "cum", 8)
    # inclusive prefix of (k%5)+1 has a closed form per k prefix
    rows = {r["k"]: r["cum"] for r in got.collect()}
    acc = 0
    for k in range(1000):
        acc += k % 5 + 1
        assert rows[k] == acc


def test_prefix_sum_plan_has_no_window(spark):
    df = _prefix_fixture(spark)
    got = partitioned_prefix_sum(df, "stratum", ["k"], "v", "cum", 4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the point: a scan, not a Window sort


# ------------------------------------------------------ pps_systematic_sample


def test_pps_sample_exactly_k_points_per_stratum(spark, sf_dir):
    s = q_pps_systematic_sample(spark, sf_dir)
    per = s.groupBy("source").agg(F.sum("n_hits").alias("pts")).collect()
    assert per and all(r["pts"] == PPS_K for r in per)


def test_pps_sample_heavy_docs_always_selected(spark, sf_dir):
    # any doc with weight >= T/k must contain >= 1 sample point
    s = q_pps_systematic_sample(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tot = docs.groupBy("source").agg(F.sum("n_chars").alias("t"))
    heavy = (
        docs.join(tot, "source")
        .filter(F.col("n_chars") * PPS_K >= F.col("t"))
        .select("doc_id")
    )
    missed = heavy.join(s.select("doc_id"), "doc_id", "left_anti")
    assert missed.count() == 0


# ------------------------------------------------------------ resample_ffill


def test_resample_spine_is_gap_free_and_filled(spark, sf_dir):
    r = q_resample_ffill(spark, sf_dir)
    per_user = r.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.sum(F.col("n_events_filled").isNull().cast("int")).alias("n_null"),
    )
    bad = per_user.filter(
        (F.col("n_days") != F.datediff("d1", "d0") + 1)
        | (F.col("n_null") != 0)
    )
    assert bad.count() == 0
    # observed rows carry their own count; gap rows repeat the previous one
    lagged = r.withColumn(
        "prev",
        F.lag("n_events_filled").over(
            Window.partitionBy("user_id").orderBy("day")
        ),
    )
    assert (
        lagged.filter(
            (F.col("observed") == 0)
            & (F.col("n_events_filled") != F.col("prev"))
        ).count()
        == 0
    )


# ------------------------------------------------------ incremental_agg_merge


def test_incremental_merge_equals_full_recompute(spark, sf_dir):
    merged = q_incremental_agg_merge(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    full = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


# ---------------------------------------------------- rolling_distinct_users


def test_rolling_distinct_matches_bruteforce(spark, sf_dir):
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = q_rolling_distinct_users(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    du = (
        e.select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
    )
    ends = got.select("window_end")
    brute = (
        ends.join(
            du,
            (F.col("day") <= F.col("window_end"))
            & (
                F.col("day")
                >= F.date_sub("window_end", ROLLING_WINDOW_DAYS - 1)
            ),
        )
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("n_users_7d"))
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


# ----------------------------------------------------------- triangle_count


def test_triangle_conservation(spark, sf_dir):
    # every triangle contributes to exactly 3 nodes; if all participating
    # nodes fit in the top-k, the per-node sum must be 3 x the naive
    # unoriented triangle count over the SAME edge set
    from imperio_patitas_etl_spark.queries.affinity import (
        MIN_PAIR_SUPPORT,
        _copurchase_pairs,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = q_triangle_count(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _copurchase_pairs(li)
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    naive = (
        e1.join(e2, F.col("e1.part_a") == F.col("e2.part_a"))
        .filter(F.col("e1.part_b") < F.col("e2.part_b"))
        .join(
            e3,
            (F.col("e3.part_a") == F.col("e1.part_b"))
            & (F.col("e3.part_b") == F.col("e2.part_b")),
        )
        .count()
    )
    if len(got) < 50:  # top-k truncation didn't bite -> exact conservation
        assert sum(r["n_triangles"] for r in got) == 3 * naive
    else:
        assert sum(r["n_triangles"] for r in got) <= 3 * naive


# ----------------------------------------------------- equi_depth_histogram


def test_equi_depth_buckets_balanced_and_ordered(spark, sf_dir):
    h = q_equi_depth_histogram(spark, sf_dir)
    rows = sorted(h.collect(), key=lambda r: r["bucket"])
    n = sum(r["n_rows"] for r in rows)
    lo, hi = n // EQUI_DEPTH_BUCKETS, -(-n // EQUI_DEPTH_BUCKETS)
    assert all(lo <= r["n_rows"] <= hi for r in rows)
    assert [r["bucket"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] <= b["lo_cents"]


# --------------------------------------------------------- pmi_collocations


def test_pmi_threshold_and_order(spark, sf_dir):
    rows = q_pmi_collocations(spark, sf_dir).collect()
    assert rows, "corpus should yield collocations"
    assert all(r["pair_cnt"] >= PMI_MIN_COUNT for r in rows)
    pmis = [r["pmi_unat"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


# ------------------------------------------------------------ feature_scale


def test_feature_scale_range_and_extremes(spark, sf_dir):
    s = q_feature_scale(spark, sf_dir)
    stats = s.groupBy("dim").agg(
        F.min("scaled_micro").alias("mn"), F.max("scaled_micro").alias("mx")
    )
    rows = stats.collect()
    assert len(rows) == FEATURE_SCALE_DIMS
    # min-max scaling pins the per-dimension extremes exactly
    assert all(r["mn"] == 0 and r["mx"] == 1_000_000 for r in rows)


# ------------------------------------------- event_transition_matrix


def test_transition_matrix_conserves_and_normalizes(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        q_event_transition_matrix,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    t = q_event_transition_matrix(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    # each user with k events contributes exactly k-1 transitions
    assert (
        t.agg(F.sum("n_trans")).collect()[0][0] == n_events - n_users
    )
    # floor-rounded row probabilities sum to within one bp per cell
    rows = t.groupBy("from_type").agg(
        F.sum("prob_bp").alias("s"), F.count("*").alias("k")
    )
    bad = rows.filter(
        (F.col("s") > 10000) | (F.col("s") <= 10000 - F.col("k"))
    )
    assert bad.count() == 0


# ------------------------------------------- attribution_last_touch


def test_attribution_matches_bruteforce_inequality_join(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        ATTRIBUTION_WINDOW_DAYS,
        q_attribution_last_touch,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = q_attribution_last_touch(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (
            (F.col("click_ts") < F.col("purchase_ts"))
            | (
                (F.col("click_ts") == F.col("purchase_ts"))
                & (F.col("click_id") < F.col("purchase_id"))
            )
        )
        & (
            F.col("click_ts")
            >= F.col("purchase_ts")
            - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_DAYS} DAYS")
        ),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    brute = (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            F.col("click_id").isNotNull().alias("attributed"),
        )
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


# ------------------------------------------- node_jaccard_linkpred


def test_linkpred_candidates_are_nonedges_with_valid_scores(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.affinity import (
        MIN_PAIR_SUPPORT,
        _copurchase_pairs,
        q_node_jaccard_linkpred,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = q_node_jaccard_linkpred(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _copurchase_pairs(li)
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
    )
    # every predicted link is a NON-edge sharing >= 1 neighbor, with a
    # well-formed Jaccard (0 < bp <= 10000, cn <= min(deg))
    assert got.join(edges, ["part_a", "part_b"], "inner").count() == 0
    bad = got.filter(
        (F.col("cn") < 1)
        | (F.col("jaccard_bp") <= 0)
        | (F.col("jaccard_bp") > 10000)
        | (F.col("cn") > F.least("deg_a", "deg_b"))
    )
    assert bad.count() == 0


# ------------------------------------------------- dq_anomaly_mad


def test_mad_profile_matches_driver_bruteforce(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        MAD_K,
        q_dq_anomaly_mad,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = {r["event_type"]: r for r in q_dq_anomaly_mad(spark, sf_dir).collect()}
    import math

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        vm = math.floor(r["value"] * 1_000_000)
        by_type.setdefault(r["event_type"], []).append((vm, r["event_id"]))
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1][0]
        devs = sorted(
            (abs(vm - med), eid) for vm, eid in vals
        )
        mad = devs[(len(devs) + 1) // 2 - 1][0]
        n_out = sum(1 for d, _ in devs if d > MAD_K * mad)
        g = got[t]
        assert (g["n"], g["med_micro"], g["mad_micro"], g["n_outliers"]) == (
            len(vals),
            med,
            mad,
            n_out,
        ), t


# ------------------------------------------- group_quantiles_exact


def test_group_quantiles_ordered_and_median_consistent(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        q_dq_anomaly_mad,
        q_group_quantiles_exact,
    )

    rows = q_group_quantiles_exact(spark, sf_dir).collect()
    by_type: dict[str, dict[int, int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q_pct"]] = r["value_micro"]
    med = {
        r["event_type"]: r["med_micro"]
        for r in q_dq_anomaly_mad(spark, sf_dir).collect()
    }
    assert set(by_type) == set(med)
    for t, qs in by_type.items():
        assert set(qs) == {25, 50, 75}
        assert qs[25] <= qs[50] <= qs[75]
        # type-1 p50 rank ceil(n/2) == lower-median rank (n+1)//2
        assert qs[50] == med[t]


# ------------------------------------------- entity_resolution_blocked


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_entity_resolution_matches_bruteforce(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.affinity import (
        ER_MAX_LEV,
        q_entity_resolution_blocked,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = {
        (r["name_a"], r["name_b"], r["lev"])
        for r in q_entity_resolution_blocked(spark, sf_dir).collect()
    }
    names = [
        r["p_name"]
        for r in load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .collect()
    ]
    want = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            lo, hi = min(a, b), max(a, b)
            if lo.split(" ")[-1] != hi.split(" ")[-1]:
                continue
            d = _lev(lo, hi)
            if d <= ER_MAX_LEV:
                want.add((lo, hi, d))
    assert got == want and want


# ------------------------------------------- bom_rollup


def test_bom_rollup_matches_driver_bruteforce(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import q_bom_rollup
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = {
        r["node"]: (r["n_subtree"], r["subtree_cents"])
        for r in q_bom_rollup(spark, sf_dir).collect()
    }
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    ).collect()
    want: dict[int, list[int]] = {}
    for r in parts:
        cents = round(r["p_retailprice"] * 100)
        node = r["p_partkey"]
        while True:
            acc = want.setdefault(node, [0, 0])
            acc[0] += 1
            acc[1] += cents
            if node < 10:
                break
            node //= 10
    assert got == {k: tuple(v) for k, v in want.items()}


# ------------------------------------------- khop_reach


def test_khop_matches_python_bfs(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.affinity import (
        KHOP_MAX,
        KHOP_SEED_MOD,
        MIN_PAIR_SUPPORT,
        _copurchase_pairs,
        q_khop_reach,
    )
    from imperio_patitas_etl_spark.sources.parquet import load_table

    got = {
        r["part_id"]: r["hops"] for r in q_khop_reach(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        _copurchase_pairs(li)
        .filter(F.col("pair_cnt") >= MIN_PAIR_SUPPORT)
        .select("part_a", "part_b")
        .collect()
    )
    adj: dict[int, set[int]] = {}
    for r in edges:
        adj.setdefault(r["part_a"], set()).add(r["part_b"])
        adj.setdefault(r["part_b"], set()).add(r["part_a"])
    dist = {n: 0 for n in adj if n % KHOP_SEED_MOD == 0}
    frontier = set(dist)
    for hop in range(1, KHOP_MAX + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.add(v)
        frontier = nxt
    assert got == dist


# ------------------------------------------- scd2_time_weighted


def test_twa_bounded_and_duration_conserves(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        SCD2_TWA_HORIZON,
        q_scd2_history,
        q_scd2_time_weighted,
    )

    twa = q_scd2_time_weighted(spark, sf_dir)
    h = q_scd2_history(spark, sf_dir)
    # the weighted average lies within each customer's [min, max] price
    bounds = h.groupBy("custkey").agg(
        F.min("price_cents").alias("lo"),
        F.max("price_cents").alias("hi"),
        F.min("valid_from").alias("first_from"),
    )
    j = twa.join(bounds, "custkey")
    assert (
        j.filter(
            (F.col("twa_cents") < F.col("lo"))
            | (F.col("twa_cents") > F.col("hi"))
        ).count()
        == 0
    )
    # intervals tile [first_from, horizon): total duration == horizon - first
    bad = j.filter(
        F.col("total_dur_us")
        != F.unix_micros(F.lit(SCD2_TWA_HORIZON).cast("timestamp"))
        - F.unix_micros(F.col("first_from").cast("timestamp"))
    )
    assert bad.count() == 0
