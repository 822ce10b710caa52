"""CSV / JSON-lines landing sources: declared-schema scans, corrupt-row
quarantine (good + bad partition the input), and parquet round-trip
fidelity through the warehouse's native format."""

from __future__ import annotations

from imperio_patitas_etl_spark.sources.files import (
    CORRUPT_COL,
    load_csv,
    load_jsonl,
    split_corrupt,
)

SCHEMA = "id long, name string, amount double"


def test_csv_quarantine_partitions_input(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,amount\n"
        "1,ana,10.5\n"
        "2,ben,\n"                      # empty -> declared nullValue
        'not,a,valid,row,at,all\n'      # arity mismatch -> quarantine
        "4,dana,7.25\n"
    )
    df = load_csv(spark, str(p), SCHEMA)
    good, bad = split_corrupt(df)
    assert good.count() == 3
    assert bad.count() == 1
    assert CORRUPT_COL not in good.columns
    rows = {r["id"]: r for r in good.collect()}
    assert rows[2]["amount"] is None
    assert rows[4]["name"] == "dana"
    assert "not,a,valid" in bad.collect()[0][CORRUPT_COL]


def test_jsonl_quarantine_and_schema(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ana", "amount": 10.5}\n'
        '{"id": 2, "name": "ben"}\n'            # missing field -> NULL, good
        'this is not json\n'                    # quarantine
        '{"id": 4, "name": "dana", "amount": 7.25}\n'
    )
    good, bad = split_corrupt(load_jsonl(spark, str(p), SCHEMA))
    assert good.count() == 3
    assert bad.count() == 1
    assert {r["id"] for r in good.collect()} == {1, 2, 4}


def test_csv_roundtrip_through_parquet(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name,amount\n1,ana,10.5\n2,ben,3.25\n")
    good, _ = split_corrupt(load_csv(spark, str(p), SCHEMA))
    out = str(tmp_path / "out.parquet")
    good.write.parquet(out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, good.collect()))
    assert dict(back.dtypes) == dict(good.dtypes)
