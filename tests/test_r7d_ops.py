"""Property tests for the r7d/r7e waves: deterministic HLL, sweep-line
concurrency, CDC apply, block checksums, bigram LM, A-ES weighted
sampling, KMV join-cardinality, per-group OLS.

Each operator's exact-value parity with DuckDB is covered by
tools/check.py; these tests pin the SEMANTIC invariants a value-hash
can't express (error bounds, conservation laws, idempotence, damage
localization).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.queries.analytics import (
    CHECKSUM_BUCKETS,
    _CK_DROP_MOD,
    _CK_FLIP_MOD,
    q_cdc_apply,
    q_interval_concurrency,
    q_table_checksum_blocks,
)
from imperio_patitas_etl_spark.queries.core import (
    HLL_M,
    q_hll_distinct_sketch,
)
from imperio_patitas_etl_spark.queries.text import q_bigram_logprob
from imperio_patitas_etl_spark.sources.parquet import load_table

_MD5INT = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    rows = q_hll_distinct_sketch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_zero_regs <= HLL_M
        assert r.z_scaled > 0
        # raw HLL relative error is ~1.04/sqrt(m) ≈ 13% at m=64; allow
        # 4 sigma, plus slack when the small-range regime (many empty
        # registers) applies, where the RAW estimator biases low by
        # design (the published n_zero_regs feeds the correction).
        rel = abs(r.hll_est - r.exact_distinct) / r.exact_distinct
        bound = 4 * 1.04 / math.sqrt(HLL_M)
        if r.n_zero_regs == 0:
            assert rel < bound, r
        # err_bp is consistent with the two published values
        assert abs(r.err_bp - (r.hll_est - r.exact_distinct) / r.exact_distinct * 10000) < 1.5


def test_interval_concurrency_conservation(spark, sf_dir):
    """Σ deltas = 0 (every start has an end), the curve never goes
    negative, and the global max equals a brute-force overlap count at
    its argmax instant."""
    from imperio_patitas_etl_spark.queries.streaming_ops import (
        q_sessionize_events,
    )

    out = q_interval_concurrency(spark, sf_dir)
    rows = out.collect()
    assert rows
    assert all(r.max_concurrent >= 1 for r in rows)

    from imperio_patitas_etl_spark.functions.cleaning import epoch_us

    sess = q_sessionize_events(spark, sf_dir).select(
        epoch_us(F.col("first_ts")).alias("s"),
        epoch_us(F.col("last_ts")).alias("e"),
    )
    best = max(rows, key=lambda r: r.max_concurrent)
    # brute-force: count sessions overlapping some instant that day —
    # the sweep max for the day must be achievable by SOME instant; we
    # verify at every session-start instant of that day (the max of a
    # right-continuous step function is attained at a +1 step).
    day_us = 86_400_000_000
    starts = [
        r.s
        for r in sess.collect()
        if r.s // day_us == best.day_no
    ]
    pairs = sess.collect()
    brute = max(
        sum(1 for p in pairs if p.s <= t <= p.e) for t in starts
    )
    assert brute == best.max_concurrent


def test_cdc_apply_tombstones_and_idempotence(spark, sf_dir):
    out = q_cdc_apply(spark, sf_dir)
    res = out.collect()
    assert res
    o = load_table(spark, sf_dir, "orders")
    # last-version-is-delete keys must be absent
    last = (
        o.selectExpr(
            "o_custkey AS key",
            "o_orderdate",
            "o_orderkey",
            f"CASE WHEN {_MD5INT.format(x='CAST(o_orderkey AS STRING)')} % 10 = 0"
            " THEN 'D' ELSE 'U' END AS op",
        )
        .withColumn(
            "rn",
            F.expr(
                "row_number() OVER (PARTITION BY key"
                " ORDER BY o_orderdate DESC, o_orderkey DESC)"
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    deleted = {r.key for r in last if r.op == "D"}
    live = {r.key for r in last if r.op == "U"}
    got = {r.key for r in res}
    assert got == live
    assert not (got & deleted)
    # applying the same log twice changes nothing (apply is a pure
    # function of the log): re-run and compare the full row set
    again = {tuple(r) for r in q_cdc_apply(spark, sf_dir).collect()}
    assert again == {tuple(r) for r in res}


def test_table_checksum_localizes_damage(spark, sf_dir):
    """Every reported bucket contains at least one dropped or flipped
    row, and every dropped/flipped row's bucket is reported — the
    merkle property: damage localizes to exactly the dirty blocks."""
    diff = q_table_checksum_blocks(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    h_key = _MD5INT.format(x="CAST(o_orderkey AS STRING)")
    damaged = (
        o.selectExpr(f"{h_key} AS hk")
        .filter(f"hk % {_CK_DROP_MOD} = 0 OR hk % {_CK_FLIP_MOD} = 0")
        .selectExpr(
            f"hk % {CHECKSUM_BUCKETS} AS bucket",
            f"hk % {_CK_DROP_MOD} = 0 AS dropped",
        )
        .collect()
    )
    dirty = {r.bucket for r in damaged}
    drop_buckets = {r.bucket for r in damaged if r.dropped}
    reported = {r.bucket for r in diff}
    assert reported == dirty
    for r in diff:
        if r.bucket in drop_buckets:
            # at least one row missing -> count mismatch
            assert r.n_rows_primary > r.n_rows_replica
        else:
            # flip-only bucket: counts equal, XOR disagrees
            assert r.n_rows_primary == r.n_rows_replica
            assert r.xor_primary != r.xor_replica


def test_bigram_logprob_bounds(spark, sf_dir):
    """Interpolated probability < 1 ⇒ every per-doc sum is negative;
    n_bigrams = n_tokens − 1 for multi-token docs; mean logprob is
    bounded below by ln of the rarest interpolated pair."""
    out = q_bigram_logprob(spark, sf_dir).collect()
    assert out
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    ntok = {r.doc_id: r.n for r in docs}
    for r in out:
        assert r.sum_lp_unat < 0
        assert r.n_bigrams == ntok[r.doc_id] - 1


def test_weighted_sample_aes_is_true_topk(spark, sf_dir):
    """The k returned rows hold the k largest priorities over the WHOLE
    population (TakeOrdered must not truncate per-partition), and the
    boundary is deterministic under the (priority, doc_id) tie-break."""
    from imperio_patitas_etl_spark.queries.corpus import (
        AES_K,
        q_weighted_sample_aes,
    )

    sample = q_weighted_sample_aes(spark, sf_dir).collect()
    assert len(sample) == AES_K
    assert all(r.w > 0 for r in sample)
    # recompute every doc's priority and check the cut line
    d = load_table(spark, sf_dir, "documents").filter("n_chars > 0")
    h = _MD5INT.format(x="concat('aes_', CAST(doc_id AS STRING))")
    allp = d.selectExpr(
        "doc_id",
        f"CAST(ROUND(ln((CAST({h} AS DOUBLE) + 1.0) / 1152921504606846976.0)"
        " / CAST(n_chars AS DOUBLE) * 1000000000000) AS BIGINT)"
        " AS priority_punits",
    ).collect()
    ordered = sorted(allp, key=lambda r: (-r.priority_punits, r.doc_id))
    expect = {r.doc_id for r in ordered[:AES_K]}
    assert {r.doc_id for r in sample} == expect


def test_kmv_join_cardinality_sane(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.core import (
        KMV_JC_K,
        q_kmv_join_cardinality,
    )

    row = q_kmv_join_cardinality(spark, sf_dir).collect()[0]
    assert 0 < row.n_both <= row.n_mins <= KMV_JC_K
    if row.n_mins < KMV_JC_K:
        # degenerate exact branch: estimate IS the sample intersection
        assert row.est_inter == float(row.n_both) == float(row.exact_inter)
        assert row.err_bp == 0
    else:
        # KMV union error ~1/sqrt(k) ≈ 6% at k=256; Jaccard sampling adds
        # binomial noise — 40% is a loose 4-sigma-ish sanity bound that
        # still catches an off-by-2^k scaling bug
        assert abs(row.err_bp) < 4000


def test_group_linear_fit_matches_exact_python(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        q_group_linear_fit,
    )

    got = {r.grp: r for r in q_group_linear_fit(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS grp",
        "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS x",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y",
    ).collect()
    groups: dict[str, list] = {}
    for r in o:
        groups.setdefault(r.grp, []).append((r.x, r.y))
    for grp, pts in groups.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num = (n * sxy - sx * sy) * 1_000_000
        den = n * sxx - sx * sx
        # Python // floors; Spark div truncates toward zero — normalize
        q = abs(num) // abs(den)
        slope = q if (num >= 0) == (den >= 0) else -q
        r = got[grp]
        assert r.n == n
        assert r.slope_microcents_per_day == slope
        assert r.mean_x_day == sx // n
        assert r.mean_y_cents == sy // n


def test_key_skew_audit_ranks_and_shares(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        SKEW_TOP,
        q_key_skew_audit,
    )

    rows = sorted(q_key_skew_audit(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, min(SKEW_TOP, len(rows)) + 1))
    # counts descend, cumulative share is the running sum and monotone
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    run = 0
    for r in rows:
        assert r.share_bp == r.cnt * 10000 // r.total_rows
        run += r.share_bp
        assert r.cum_share_bp == run
    # the rank-1 key really is the hottest key in the raw relation
    e = load_table(spark, sf_dir, "events")
    true_top = (
        e.groupBy("user_id").count().orderBy(F.desc("count"), "user_id").first()
    )
    assert rows[0].user_id == true_top.user_id
    assert rows[0].cnt == true_top["count"]


def test_join_strategy_advisor_rule_consistency(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        ADVISOR_BROADCAST_MAX_ROWS,
        ADVISOR_SKEW_BP,
        q_join_strategy_advisor,
    )

    r = q_join_strategy_advisor(spark, sf_dir).collect()[0]
    assert r.max_key_share_bp == r.max_key_rows * 10000 // r.n_probe_rows
    if r.n_build_rows <= ADVISOR_BROADCAST_MAX_ROWS:
        expect = "broadcast"
    elif r.max_key_share_bp >= ADVISOR_SKEW_BP:
        expect = "salted_shuffle"
    else:
        expect = "sort_merge"
    assert r.recommendation == expect


def test_group_corr_bounded_and_sign_matches_slope(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        q_group_corr,
        q_group_linear_fit,
    )

    corr = {r.grp: r for r in q_group_corr(spark, sf_dir).collect()}
    fit = {r.grp: r for r in q_group_linear_fit(spark, sf_dir).collect()}
    assert set(corr) == set(fit)
    for grp, r in corr.items():
        assert -1_000_000 <= r.corr_micro <= 1_000_000
        s = fit[grp].slope_microcents_per_day
        # same numerator => same sign (zero slope can round either way)
        if abs(r.corr_micro) > 5 and abs(s) > 5:
            assert (r.corr_micro > 0) == (s > 0)


def test_funnel_time_bounded_matches_bruteforce(spark, sf_dir):
    """Per-user brute-force replay of the windowFunnel semantic:
    a click qualifies iff some strictly-earlier view is within W; a
    purchase converts iff some strictly-earlier qualified click is
    within W. Same-instant events must NOT see each other."""
    from imperio_patitas_etl_spark.functions.cleaning import epoch_us
    from imperio_patitas_etl_spark.queries.analytics import (
        FUNNEL_WINDOW_US,
        q_funnel_time_bounded,
    )

    got = {r.user_id: r for r in q_funnel_time_bounded(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", epoch_us(F.col("ts")).alias("t"))
        .collect()
    )
    byu: dict[int, list] = {}
    for r in ev:
        byu.setdefault(r.user_id, []).append((r.t, r.event_type))
    for uid, evs in byu.items():
        evs.sort()
        views = [t for t, k in evs if k == "view"]
        qclicks = []
        for t, k in evs:
            if k == "click" and any(v < t <= v + FUNNEL_WINDOW_US for v in views):
                qclicks.append(t)
        convs = [
            t
            for t, k in evs
            if k == "purchase"
            and any(c < t <= c + FUNNEL_WINDOW_US for c in qclicks)
        ]
        r = got[uid]
        assert r.n_views == len(views)
        assert r.n_qclicks == len(qclicks)
        assert r.converted == (1 if convs else 0)
        assert r.first_conv_us == (min(convs) if convs else None)


def test_trimmed_mean_matches_python(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        TRIM_PCT,
        q_trimmed_mean,
    )

    got = {r.grp: r for r in q_trimmed_mean(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS grp",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents",
        "o_orderkey",
    ).collect()
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.grp, []).append((r.cents, r.o_orderkey))
    for grp, pts in groups.items():
        pts.sort()
        n = len(pts)
        k = n * TRIM_PCT // 100
        kept = [c for c, _ in pts[k : n - k]]
        r = got[grp]
        assert r.n_total == n
        assert r.n_kept == n - 2 * k
        assert r.trimmed_mean_microcents == sum(kept) * 1_000_000 // len(kept)
        # robustness direction: the trim removes tail mass symmetrically
        assert min(kept) >= pts[0][0] and max(kept) <= pts[-1][0]


def test_ab_test_summary_exact_moments(spark, sf_dir):
    import math

    from imperio_patitas_etl_spark.queries.analytics import (
        AB_SALT,
        q_ab_test_summary,
    )

    row = q_ab_test_summary(spark, sf_dir).collect()[0]
    # recompute assignment + moments in Python
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.expr("CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)").alias("m"))
        .selectExpr(
            f"{_MD5INT.format(x=repr(AB_SALT) + ' || CAST(user_id AS STRING)')} % 2"
            " AS variant",
            "m",
        )
        .collect()
    )
    for v, (n_k, mean_k) in {0: ("n0", "mean0"), 1: ("n1", "mean1")}.items():
        xs = [r.m for r in ev if r.variant == v]
        assert row[n_k] == len(xs)
        assert row[mean_k] == sum(xs) // len(xs)
    assert row.diff_units == row.mean1 - row.mean0
    # Welch SE from exact moments
    def var(xs):
        n, sx = len(xs), sum(xs)
        sxx = sum(x * x for x in xs)
        return (n * sxx - sx * sx) / n / (n - 1)

    xs0 = [r.m for r in ev if r.variant == 0]
    xs1 = [r.m for r in ev if r.variant == 1]
    se = math.sqrt(var(xs0) / len(xs0) + var(xs1) / len(xs1))
    assert abs(row.welch_se_units - se) <= 1


def test_power_iteration_rayleigh_ritz_and_monotonicity(spark, sf_dir):
    """Exact invariants + the numpy cross-check: the published Rayleigh
    quotient is bounded above by the true top eigenvalue of the SAME
    integer Gram matrix (Rayleigh-Ritz) and strictly exceeds the
    starting vector's quotient (each power step increases it); the
    iterate renormalizes to max-|component| = 10⁶ with canonical
    sign."""
    import numpy as np

    from imperio_patitas_etl_spark.queries.vector import (
        q_power_iteration_pc,
    )

    rows = sorted(
        q_power_iteration_pc(spark, sf_dir).collect(), key=lambda r: r.dim
    )
    assert [r.dim for r in rows] == list(range(64))
    comps = [r.comp_micro for r in rows]
    assert max(abs(c) for c in comps) == 1_000_000
    assert comps[0] >= 0  # canonical sign
    lam_scaled = rows[0].rayleigh_units
    assert all(r.rayleigh_units == lam_scaled for r in rows)

    X = np.array(
        load_table(spark, sf_dir, "embeddings")
        .selectExpr(
            "transform(embedding, x ->"
            " CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS iv"
        )
        .rdd.map(lambda r: r.iv)
        .collect(),
        dtype=float,
    )
    G = X.T @ X
    evals = np.linalg.eigvalsh(G)
    v = np.array(comps, dtype=float)
    rq = (v @ G @ v) / (v @ v)
    # Rayleigh-Ritz: any vector's quotient is <= lambda_max
    assert rq <= evals[-1] * (1 + 1e-9)
    assert abs(lam_scaled - rq / 1e8) <= max(2, rq / 1e8 * 1e-6)
    # monotonicity: the iterate beats the all-ones start
    ones = np.ones(64)
    rq0 = (ones @ G @ ones) / (ones @ ones)
    assert rq > rq0


def test_rolling_median_daily_matches_python(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        ROLL_MED_DAYS,
        q_rolling_median_daily,
    )

    got = {
        (r.grp, r.day_no): r
        for r in q_rolling_median_daily(spark, sf_dir).collect()
    }
    daily = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS grp",
            "CAST(datediff(o_orderdate, DATE '1970-01-01') AS BIGINT) AS d",
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("grp", "d")
        .agg(F.sum("cents").alias("c"))
        .collect()
    )
    byg: dict[str, dict[int, int]] = {}
    for r in daily:
        byg.setdefault(r.grp, {})[r.d] = r.c
    for grp, days in byg.items():
        for d, c in days.items():
            window = sorted(
                v for dd, v in days.items() if d - (ROLL_MED_DAYS - 1) <= dd <= d
            )
            r = got[(grp, d)]
            assert r.day_cents == c
            assert r.n_days_in_window == len(window)
            assert r.rolling_median_cents == window[(len(window) + 1) // 2 - 1]


def test_srm_check_matches_counts_and_rule(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import (
        AB_SALT,
        SRM_CHI2_CRIT_MICRO,
        q_srm_check,
    )

    row = q_srm_check(spark, sf_dir).collect()[0]
    users = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            f"{_MD5INT.format(x=repr(AB_SALT) + ' || CAST(user_id AS STRING)')} % 2"
            " AS variant",
            "user_id",
        )
        .distinct()
        .collect()
    )
    n0 = sum(1 for r in users if r.variant == 0)
    n1 = sum(1 for r in users if r.variant == 1)
    assert (row.n0, row.n1) == (n0, n1)
    chi2 = (n0 - n1) ** 2 * 1_000_000 // (n0 + n1)
    assert row.chi2_micro == chi2
    assert row.split_healthy == (chi2 < SRM_CHI2_CRIT_MICRO)
    # the deterministic md5 split on this corpus must itself be healthy —
    # if this fires, the hash is biased, which would invalidate
    # ab_test_summary too
    assert row.split_healthy


def test_cusum_window_identity_equals_recurrence(spark, sf_dir):
    """The load-bearing claim: S_t − min_{j≤t} S_j equals the sequential
    recurrence s_t = max(0, s_{t−1} + dev_t) on every series — replayed
    per event type in Python over the same daily counts."""
    from imperio_patitas_etl_spark.queries.analytics import (
        q_cusum_changepoint,
    )

    rows = q_cusum_changepoint(spark, sf_dir).collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    assert series
    for et, rs in series.items():
        rs.sort(key=lambda r: r.day_no)
        mu = rs[0].mu
        assert all(r.mu == mu for r in rs)
        s = 0
        for r in rs:
            s = max(0, s + (r.x - mu - mu // 20))
            assert r.cusum == s, (et, r.day_no)
            assert r.drift_alert == (s > mu)


def test_ndcg_eval_matches_python_replay(spark, sf_dir):
    """NDCG bounds + full Python replay: rank the BM25 run, apply the
    same integer discount weights, and reproduce dcg/idcg/ndcg_bp."""
    from imperio_patitas_etl_spark.queries.affinity import (
        _NDCG_W,
        BM25_TERMS,
        NDCG_REL_CAP,
        q_bm25_topk,
        q_ndcg_eval,
    )

    row = q_ndcg_eval(spark, sf_dir).collect()[0]
    assert 0 < row.ndcg_bp <= 10000
    docs = load_table(spark, sf_dir, "documents").collect()
    rel = {}
    for d in docs:
        n = sum(1 for t in d.text.split(" ") if t in BM25_TERMS)
        if n:
            rel[d.doc_id] = min(n, NDCG_REL_CAP)
    run = sorted(
        q_bm25_topk(spark, sf_dir).collect(),
        key=lambda r: (-r.score_unat, r.doc_id),
    )
    dcg = sum(rel.get(r.doc_id, 0) * w for r, w in zip(run, _NDCG_W))
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[: len(_NDCG_W)]
    idcg = sum(v * w for (_, v), w in zip(ideal, _NDCG_W))
    assert row.dcg_micro == dcg
    assert row.idcg_micro == idcg
    assert row.ndcg_bp == dcg * 10000 // idcg


def _daily_counts(spark, sf_dir):
    from imperio_patitas_etl_spark.functions.cleaning import epoch_us

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", epoch_us(F.col("ts")).alias("t"))
        .selectExpr("event_type", "t div 86400000000 AS d")
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    byt: dict[str, dict[int, int]] = {}
    for r in rows:
        byt.setdefault(r.event_type, {})[r.d] = r["count"]
    return byt


def test_dow_seasonal_residual_reconstructs(spark, sf_dir):
    import datetime

    from imperio_patitas_etl_spark.queries.analytics import (
        q_dow_seasonal_residual,
    )

    out = q_dow_seasonal_residual(spark, sf_dir).collect()
    byt = _daily_counts(spark, sf_dir)
    for r in out:
        assert r.x == byt[r.event_type][r.day_no]
        assert r.x - r.dow_mean == r.residual
        # dow convention: 0 = Monday, verified against the calendar
        date = datetime.date(1970, 1, 1) + datetime.timedelta(days=r.day_no)
        assert r.dow == date.weekday()
        # baseline is the integral mean of same-dow days for this type
        same = [x for d, x in byt[r.event_type].items() if (d + 3) % 7 == r.dow]
        assert r.dow_mean == sum(same) // len(same)


def test_lag_features_exact_day_semantics(spark, sf_dir):
    from imperio_patitas_etl_spark.queries.analytics import q_lag_features

    out = q_lag_features(spark, sf_dir).collect()
    byt = _daily_counts(spark, sf_dir)
    for r in out:
        days = byt[r.event_type]
        assert r.x == days[r.day_no]
        assert r.lag1 == days.get(r.day_no - 1)
        assert r.lag7 == days.get(r.day_no - 7)
        window = [days[d] for d in range(r.day_no - 7, r.day_no) if d in days]
        assert r.trail7_days == len(window)
        assert r.trail7_sum == (sum(window) if window else None)
