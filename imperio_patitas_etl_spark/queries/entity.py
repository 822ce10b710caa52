"""Entity validate/filter/project queries (F1-F6) + scalar layer (C1-C13).

The TPC-H-ish tables are clean, so each query first derives deterministically
"dirty" input columns (sentinels, bad RUTs, non-positive amounts) from key
arithmetic — identically in Spark and in the DuckDB oracle — then applies the
reference's validation semantics (SURVEY.md §2.3, §2.6).

Table mapping (FIXTURES.md §3): customer↔cliente, part↔producto,
orders↔documento_venta, lineitem↔detalle_documento.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imperio_patitas_etl_spark.functions.cleaning import (
    blank_to_null,
    bool_to_int,
    consistency_flag,
    is_valid_email,
    is_valid_rut,
    normalize_sentinels,
    round2_exact,
    sql_round2_exact,
)
from imperio_patitas_etl_spark.operators.validate import EntitySpec, Rule
from imperio_patitas_etl_spark.sources.parquet import load_table


# --------------------------------------------------------------------------
# deterministic dirtying helpers (same arithmetic as the oracle SQL)
# --------------------------------------------------------------------------

def _dirty_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 == 0, F.lit("Sin Nombre"))
        .when(F.col("c_custkey") % 13 == 0, F.lit("   "))
        .otherwise(F.col("c_name"))
        .alias("first_name"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("not-a-rut"))
        .otherwise(
            F.concat(
                (F.lit(10000000) + F.col("c_custkey")).cast("string"),
                F.lit("-"),
                (F.col("c_custkey") % 10).cast("string"),
            )
        )
        .alias("rut"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("bad-email"))
        .otherwise(F.concat(F.lit("user"), F.col("c_custkey").cast("string"), F.lit("@example.com")))
        .alias("email"),
        "c_mktsegment",
        "c_acctbal",
    )


_DIRTY_CUSTOMER_SQL = """
    SELECT c_custkey,
           CASE WHEN c_custkey % 11 = 0 THEN 'Sin Nombre'
                WHEN c_custkey % 13 = 0 THEN '   '
                ELSE c_name END AS first_name,
           CASE WHEN c_custkey % 7 = 0 THEN 'not-a-rut'
                ELSE CAST(10000000 + c_custkey AS VARCHAR) || '-' ||
                     CAST(c_custkey % 10 AS VARCHAR) END AS rut,
           CASE WHEN c_custkey % 5 = 0 THEN 'bad-email'
                ELSE 'user' || CAST(c_custkey AS VARCHAR) || '@example.com' END AS email,
           c_mktsegment, c_acctbal
    FROM customer
"""


# --------------------------------------------------------------------------
# F1: client validator
# --------------------------------------------------------------------------

def client_spec() -> EntitySpec:
    """F1 (validate_client, etl_service.py:20-56): drop on missing id,
    blank/sentinel first name, present-but-invalid RUT; bad email is a
    warning, not a drop (etl_service.py:38-42)."""
    return EntitySpec(
        name="cliente",
        rules=[
            Rule("missing_id", F.col("c_custkey").isNotNull()),
            Rule("blank_name", normalize_sentinels("first_name").isNotNull()),
            Rule("invalid_rut", F.col("rut").isNull() | is_valid_rut("rut")),
        ],
        warnings={"email": ~F.coalesce(is_valid_email("email"), F.lit(False))},
        projection={
            "id_cliente": F.col("c_custkey"),
            "nombre": F.trim(F.col("first_name")),
            "rut": F.col("rut"),
            "email": F.col("email"),
        },
    )


def q_filter_project_client(spark: SparkSession, sf_dir: str) -> DataFrame:
    return client_spec().apply(_dirty_customer(spark, sf_dir)).accepted


ORACLE_CLIENT = f"""
    WITH dirty AS ({_DIRTY_CUSTOMER_SQL})
    SELECT c_custkey AS id_cliente,
           trim(first_name) AS nombre,
           rut,
           email,
           NOT regexp_matches(email, '^[^@]+@[^@]+\\.[^@]+$') AS warn_email
    FROM dirty
    WHERE c_custkey IS NOT NULL
      AND NOT (lower(trim(first_name)) IN ('', 'null', 'none', 'sin nombre'))
      AND (rut IS NULL OR
           regexp_matches(regexp_replace(rut, '[.\\s]', '', 'g'), '^[0-9]{{7,8}}-?[0-9kK]?$'))
"""


# --------------------------------------------------------------------------
# F2: product validator
# --------------------------------------------------------------------------

def _dirty_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 19 == 0, F.lit("null")).otherwise(F.col("p_name")).alias("name"),
        F.when(F.col("p_partkey") % 23 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("p_brand"))
        .alias("sku"),
        F.when(F.col("p_partkey") % 17 == 0, F.lit(-1.0))
        .otherwise(F.col("p_retailprice"))
        .alias("price"),
        (F.col("p_size") > 25).alias("track"),
        "p_type",
    )


_DIRTY_PART_SQL = """
    SELECT p_partkey,
           CASE WHEN p_partkey % 19 = 0 THEN 'null' ELSE p_name END AS name,
           CASE WHEN p_partkey % 23 = 0 THEN NULL ELSE p_brand END AS sku,
           CASE WHEN p_partkey % 17 = 0 THEN -1.0 ELSE p_retailprice END AS price,
           (p_size > 25) AS track,
           p_type
    FROM part
"""


def product_spec() -> EntitySpec:
    """F2 (validate_product, etl_service.py:59-107): drop on blank/sentinel
    name, missing SKU, price ≤ 0; track bool→0/1; estado := 1."""
    return EntitySpec(
        name="producto",
        rules=[
            Rule("missing_id", F.col("p_partkey").isNotNull()),
            Rule("blank_name", normalize_sentinels("name").isNotNull()),
            Rule("missing_sku", blank_to_null("sku").isNotNull()),
            Rule("bad_price", F.col("price").isNotNull() & (F.col("price") > 0)),
        ],
        projection={
            "id_producto": F.col("p_partkey"),
            "nombre": F.trim(F.col("name")),
            "codigo_sku": F.col("sku"),
            "precio_neto": F.round(F.col("price"), 2),
            "controla_stock": bool_to_int("track"),
            "estado": F.lit(1),
        },
    )


def q_filter_project_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return product_spec().apply(_dirty_part(spark, sf_dir)).accepted


ORACLE_PRODUCT = f"""
    WITH dirty AS ({_DIRTY_PART_SQL})
    SELECT p_partkey AS id_producto,
           trim(name) AS nombre,
           sku AS codigo_sku,
           ROUND(price, 2) AS precio_neto,
           CASE WHEN track THEN 1 ELSE 0 END AS controla_stock,
           1 AS estado
    FROM dirty
    WHERE p_partkey IS NOT NULL
      AND NOT (lower(trim(name)) IN ('', 'null', 'none', 'sin nombre'))
      AND nullif(trim(sku), '') IS NOT NULL
      AND price IS NOT NULL AND price > 0
"""


# --------------------------------------------------------------------------
# F3: document validator
# --------------------------------------------------------------------------

def _dirty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    total = F.when(F.col("o_orderkey") % 31 == 0, F.lit(0.0)).otherwise(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        total.alias("total"),
        F.round(total / 1.19, 2).alias("net"),
        F.round(total - F.round(total / 1.19, 2), 2).alias("tax"),
    )


_DIRTY_ORDERS_SQL = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           total,
           ROUND(total / 1.19, 2) AS net,
           ROUND(total - ROUND(total / 1.19, 2), 2) AS tax
    FROM (
        SELECT *, CASE WHEN o_orderkey % 31 = 0 THEN 0.0 ELSE o_totalprice END AS total
        FROM orders
    )
"""


def document_spec() -> EntitySpec:
    """F3 (validate_document, etl_service.py:110-155): drop on missing id or
    emission date, negative net/tax, total ≤ 0; consistency warning ±0.01."""
    return EntitySpec(
        name="documento_venta",
        rules=[
            Rule("missing_id", F.col("o_orderkey").isNotNull()),
            Rule("missing_emission", F.col("o_orderdate").isNotNull()),
            Rule("negative_net", F.col("net") >= 0),
            Rule("negative_tax", F.col("tax") >= 0),
            Rule("bad_total", F.col("total") > 0),
        ],
        warnings={
            "total_mismatch": consistency_flag(F.col("total"), F.col("net") + F.col("tax"))
        },
        projection={
            "id_documento": F.col("o_orderkey"),
            "id_cliente": F.col("o_custkey"),
            "folio": F.col("o_orderkey"),
            "fecha_emision": F.col("o_orderdate"),
            "monto_neto": F.col("net"),
            "monto_iva": F.col("tax"),
            "monto_total": F.round(F.col("total"), 2),
        },
    )


def q_filter_project_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    return document_spec().apply(_dirty_orders(spark, sf_dir)).accepted


ORACLE_DOCUMENT = f"""
    WITH dirty AS ({_DIRTY_ORDERS_SQL})
    SELECT o_orderkey AS id_documento,
           o_custkey AS id_cliente,
           o_orderkey AS folio,
           o_orderdate AS fecha_emision,
           net AS monto_neto,
           tax AS monto_iva,
           ROUND(total, 2) AS monto_total,
           (ABS(total - (net + tax)) > 0.01) AS warn_total_mismatch
    FROM dirty
    WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
      AND net >= 0 AND tax >= 0 AND total > 0
"""


# --------------------------------------------------------------------------
# F4: detail validator
# --------------------------------------------------------------------------

def _dirty_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 29 == 0, F.lit(0.0)).otherwise(
        F.col("l_quantity")
    )
    # Exact unit price: integer-cents division with half-up rounding —
    # price/qty lands on half-cent ties constantly (2-decimal price over an
    # integer qty), where double rounding is engine-dependent.
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty_int = F.col("l_quantity").cast("long")
    num = cents * 2 + qty_int
    den = qty_int * 2
    unit_price = ((num - num % den) / den).cast("long") / F.lit(100.0)
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("detail_id"),
        "l_orderkey",
        "l_partkey",
        qty.alias("qty"),
        unit_price.alias("unit_price"),
        F.round(F.col("l_discount") * 100, 2).alias("discount_pct"),
        round2_exact(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_total"
        ),
    )


_DIRTY_LINEITEM_SQL = f"""
    SELECT l_orderkey * 10 + l_linenumber AS detail_id,
           l_orderkey, l_partkey,
           CASE WHEN (l_orderkey + l_linenumber) % 29 = 0 THEN 0.0 ELSE l_quantity END AS qty,
           (((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 2 + CAST(l_quantity AS BIGINT))
             // (CAST(l_quantity AS BIGINT) * 2)) / 100.0) AS unit_price,
           ROUND(l_discount * 100, 2) AS discount_pct,
           {sql_round2_exact('l_extendedprice * (1 - l_discount)', 4)} AS net_total
    FROM lineitem
"""


def detail_spec() -> EntitySpec:
    """F4 (validate_document_detail, etl_service.py:158-201): drop on missing
    ids, qty ≤ 0, unit price ≤ 0; line-total consistency warning ±0.01."""
    return EntitySpec(
        name="detalle_documento",
        rules=[
            Rule("missing_id", F.col("detail_id").isNotNull()),
            Rule("missing_variant", F.col("l_partkey").isNotNull()),
            Rule("bad_qty", F.col("qty") > 0),
            Rule("bad_unit_price", F.col("unit_price") > 0),
        ],
        warnings={
            # tolerance check in exact 10⁻⁴ units: the true diff is an exact
            # 4-decimal value that can equal 0.01 precisely, where a double
            # comparison is engine-dependent.
            "line_total": F.abs(
                F.round(F.col("net_total") * 10000).cast("long")
                - F.round(
                    F.col("qty")
                    * F.col("unit_price")
                    * (1 - F.col("discount_pct") / 100)
                    * 10000
                ).cast("long")
            )
            > 100
        },
        projection={
            "id_detalle": F.col("detail_id"),
            "id_documento": F.col("l_orderkey"),
            "id_producto": F.col("l_partkey"),
            "cantidad": F.col("qty"),
            "precio_neto_unitario": F.col("unit_price"),
            "descuento_porcentual": F.col("discount_pct"),
            "monto_total_linea": F.col("net_total"),
        },
    )


def q_filter_project_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detail_spec().apply(_dirty_lineitem(spark, sf_dir)).accepted


ORACLE_DETAIL = f"""
    WITH dirty AS ({_DIRTY_LINEITEM_SQL})
    SELECT detail_id AS id_detalle,
           l_orderkey AS id_documento,
           l_partkey AS id_producto,
           qty AS cantidad,
           unit_price AS precio_neto_unitario,
           discount_pct AS descuento_porcentual,
           net_total AS monto_total_linea,
           (ABS(CAST(ROUND(net_total * 10000) AS BIGINT)
                - CAST(ROUND(qty * unit_price * (1 - discount_pct / 100) * 10000) AS BIGINT))
            > 100) AS warn_line_total
    FROM dirty
    WHERE detail_id IS NOT NULL AND l_partkey IS NOT NULL
      AND qty > 0 AND unit_price > 0
"""


# --------------------------------------------------------------------------
# F5: data-quality flags
# --------------------------------------------------------------------------

def q_dq_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: tolerance checks that flag but don't drop
    (etl_service.py:138-141,182-188): per-order header-vs-lines consistency."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "lines_total"
        )
    )
    flagged = o.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"), "left").select(
        "o_orderkey",
        F.coalesce(
            F.abs(F.col("o_totalprice") - F.col("lines_total")) > 0.01, F.lit(True)
        ).alias("mismatch"),
    )
    return flagged.groupBy("mismatch").agg(F.count("*").alias("n"))


ORACLE_DQ_FLAGS = """
    WITH per_order AS (
        SELECT l_orderkey,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS lines_total
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT COALESCE(ABS(o_totalprice - lines_total) > 0.01, TRUE) AS mismatch,
           COUNT(*) AS n
    FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
    GROUP BY 1
"""


# --------------------------------------------------------------------------
# C1-C13 scalar queries
# --------------------------------------------------------------------------

def q_string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C2/C12: trim + sentinel→NULL + blank→NULL
    (etl_service.py:29-40,50-54)."""
    dirty = _dirty_customer(spark, sf_dir)
    return dirty.select(
        "c_custkey",
        normalize_sentinels("first_name").alias("nombre"),
        blank_to_null("first_name").alias("nombre_raw"),
    )


ORACLE_STRING_CLEANUP = f"""
    WITH dirty AS ({_DIRTY_CUSTOMER_SQL})
    SELECT c_custkey,
           CASE WHEN lower(trim(first_name)) IN ('', 'null', 'none', 'sin nombre')
                THEN NULL ELSE trim(first_name) END AS nombre,
           nullif(trim(first_name), '') AS nombre_raw
    FROM dirty
"""


def q_regex_rut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: RUT regex accept/reject counts (etl_service.py:203-215)."""
    dirty = _dirty_customer(spark, sf_dir)
    return dirty.select(is_valid_rut("rut").alias("rut_valid")).groupBy("rut_valid").agg(
        F.count("*").alias("n")
    )


ORACLE_REGEX_RUT = f"""
    WITH dirty AS ({_DIRTY_CUSTOMER_SQL})
    SELECT regexp_matches(regexp_replace(rut, '[.\\s]', '', 'g'),
                          '^[0-9]{{7,8}}-?[0-9kK]?$') AS rut_valid,
           COUNT(*) AS n
    FROM dirty GROUP BY 1
"""


def q_regex_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: email regex accept/reject counts (etl_service.py:217-222)."""
    dirty = _dirty_customer(spark, sf_dir)
    return dirty.select(is_valid_email("email").alias("email_valid")).groupBy(
        "email_valid"
    ).agg(F.count("*").alias("n"))


ORACLE_REGEX_EMAIL = f"""
    WITH dirty AS ({_DIRTY_CUSTOMER_SQL})
    SELECT regexp_matches(email, '^[^@]+@[^@]+\\.[^@]+$') AS email_valid, COUNT(*) AS n
    FROM dirty GROUP BY 1
"""


def q_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/C7/C13: bool→int, float cast, explicit floor (Spark double→int
    truncates while DuckDB rounds, so the floor is explicit on both sides)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bool_to_int(F.col("l_quantity") > 25).alias("high_qty"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
        F.col("l_extendedprice").cast("double").alias("price_double"),
    )


ORACLE_CASTS = """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS high_qty,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(l_extendedprice AS DOUBLE) AS price_double
    FROM lineitem
"""


def q_timestamp_from_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: Unix seconds → TIMESTAMP (TIMESTAMP_SECONDS analog,
    etl_service.py:336-338). Session TZ pinned UTC; oracle uses
    make_timestamp(µs) which is TZ-naive, so both sides agree."""
    e = load_table(spark, sf_dir, "events")
    from imperio_patitas_etl_spark.functions.cleaning import ts_from_unix

    return e.select(
        "event_id",
        ts_from_unix(F.col("event_id") + F.lit(1700000000)).alias("ts_derived"),
    )


ORACLE_TIMESTAMP_FROM_UNIX = """
    SELECT event_id,
           make_timestamp((event_id + 1700000000) * 1000000) AS ts_derived
    FROM events
"""


def q_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: COALESCE/defaulting (``.get(k, 0)``, etl_service.py:125-127)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    return c.join(spend, F.col("c_custkey") == F.col("o_custkey"), "left").select(
        "c_custkey",
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spend"),
    )


ORACLE_COALESCE_DEFAULTS = """
    SELECT c_custkey, COALESCE(spend, 0.0) AS total_spend
    FROM customer LEFT JOIN (
        SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend FROM orders GROUP BY o_custkey
    ) ON c_custkey = o_custkey
"""


def q_arith_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: derived arithmetic columns (price*0.65, net+tax, qty*price*(1−d),
    |Δ|>0.01 — etl_service.py:611,139,186,140)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round2_exact(net, 4).alias("net_amount"),
        round2_exact(net * (1 + F.col("l_tax")), 6).alias("gross_amount"),
        round2_exact(F.col("l_extendedprice") * 0.65, 4).alias("floor_cost"),
        (F.abs(net - F.col("l_extendedprice")) > 0.01).alias("discounted"),
    )


ORACLE_ARITH_DERIVED = f"""
    SELECT l_orderkey, l_linenumber,
           {sql_round2_exact('l_extendedprice * (1 - l_discount)', 4)} AS net_amount,
           {sql_round2_exact('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
               AS gross_amount,
           {sql_round2_exact('l_extendedprice * 0.65', 4)} AS floor_cost,
           (ABS(l_extendedprice * (1 - l_discount) - l_extendedprice) > 0.01) AS discounted
    FROM lineitem
"""


QUERIES = {
    "filter_project_client": q_filter_project_client,
    "filter_project_product": q_filter_project_product,
    "filter_project_document": q_filter_project_document,
    "filter_project_detail": q_filter_project_detail,
    "dq_flags": q_dq_flags,
    "string_cleanup": q_string_cleanup,
    "regex_rut": q_regex_rut,
    "regex_email": q_regex_email,
    "casts": q_casts,
    "timestamp_from_unix": q_timestamp_from_unix,
    "coalesce_defaults": q_coalesce_defaults,
    "arith_derived": q_arith_derived,
}

ORACLE = {
    "filter_project_client": ORACLE_CLIENT,
    "filter_project_product": ORACLE_PRODUCT,
    "filter_project_document": ORACLE_DOCUMENT,
    "filter_project_detail": ORACLE_DETAIL,
    "dq_flags": ORACLE_DQ_FLAGS,
    "string_cleanup": ORACLE_STRING_CLEANUP,
    "regex_rut": ORACLE_REGEX_RUT,
    "regex_email": ORACLE_REGEX_EMAIL,
    "casts": ORACLE_CASTS,
    "timestamp_from_unix": ORACLE_TIMESTAMP_FROM_UNIX,
    "coalesce_defaults": ORACLE_COALESCE_DEFAULTS,
    "arith_derived": ORACLE_ARITH_DERIVED,
}
