"""The one-time legacy re-tag helper (VERDICT r14 item 4).

``allow_legacy_tag=True`` is the caller-visible opt-in for pre-r12
raw-string-tagged product tables; ``retag_table`` is the documented exit
path — rebuild once through the table's own materializer, verify the
strict realpath tag, drop the flag. These tests pin the three behaviors
the contract hinges on (generic core on a tiny synthetic table) plus the
end-to-end shape VERDICT r14 asked for: a shingle table that NEEDS the
flag, re-tagged, then consumed strictly without it.
"""

from __future__ import annotations

import os
import shutil

import pytest

from imperio_patitas_etl_spark.operators.provenance import (
    canonical_source,
    retag_table,
    tag_source,
)
from imperio_patitas_etl_spark.queries import text
from imperio_patitas_etl_spark.queries.text import _SHINGLE_SOURCE_KEY


def _write_tiny(spark, path: str, tag: str | None) -> None:
    df = spark.range(3).toDF("k")
    if tag is not None:
        df = df.withMetadata("k", {"test_source": tag})
    df.write.mode("overwrite").parquet(path)


def _rebuild_tiny(spark, sf_dir: str, path: str) -> None:
    tag_source(spark.range(3).toDF("k"), "k", "test_source", sf_dir).write.mode(
        "overwrite"
    ).parquet(path)


def _legacy_tiny_setup(spark, tmp_path):
    """The shared precondition for the generic retag_table tests: a
    symlinked source spelling (realpath differs from the raw string)
    and a tiny table carrying that raw spelling as its legacy tag.
    Returns (legacy_spelling, table_path)."""
    src = tmp_path / "sf"
    src.mkdir()
    link = tmp_path / "sf_alias"
    os.symlink(src, link)
    legacy_spelling = str(link)
    out = str(tmp_path / "tbl")
    _write_tiny(spark, out, legacy_spelling)
    return legacy_spelling, out


def test_retag_core_three_branches(spark, tmp_path):
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )

    # 1) legacy raw tag -> rebuilt, strict tag verified, True
    assert retag_table(spark, legacy_spelling, out, **kwargs) is True
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)

    # 2) already strict -> no-op, False (idempotent migration sweep)
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False

    # 3) genuine mismatch (wrong source, or no tag at all) -> refused,
    #    never laundered into a strict tag
    with pytest.raises(ValueError, match="genuine source mismatch"):
        retag_table(spark, str(tmp_path / "elsewhere"), out, **kwargs)
    _write_tiny(spark, out, None)
    with pytest.raises(ValueError, match="genuine source mismatch"):
        retag_table(spark, legacy_spelling, out, **kwargs)

    # 4) wrong table kind (tag column absent — e.g. the edges retag
    #    pointed at a shingle table): refused as a ValueError so the
    #    CLI's documented exit-2 path fires, not a raw KeyError from
    #    the schema lookup
    with pytest.raises(ValueError, match="wrong table kind"):
        retag_table(
            spark,
            legacy_spelling,
            out,
            column="no_such_column",
            key="test_source",
            table_desc="test table",
            rebuild=_rebuild_tiny,
        )


def test_shingle_retag_end_to_end(spark, sf_dir, tmp_path):
    """flag-needed -> retag -> strict-pass (the VERDICT r14 done bar):
    a pre-r12 shingle table is refused by the strict default, consumable
    only under allow_legacy_tag=True; after retag_shingle_table the
    consumer works WITHOUT the flag."""
    link = tmp_path / "sf_alias"
    os.symlink(sf_dir, link)
    legacy_spelling = str(link)
    shingle_path = str(tmp_path / "shingles")
    # simulate the pre-r12 writer: materialize, then re-write the table
    # with the raw (non-realpath) spelling as its tag
    text.materialize_shingle_table(spark, legacy_spelling, shingle_path)
    legacy = (
        spark.read.parquet(shingle_path)
        .withMetadata("doc_id", {_SHINGLE_SOURCE_KEY: legacy_spelling})
    )
    legacy_path = str(tmp_path / "shingles_legacy")
    legacy.write.parquet(legacy_path)

    # needs the flag before the retag
    with pytest.raises(ValueError, match="allow_legacy_tag"):
        text.ngram_family_from_shingles(spark, legacy_spelling, legacy_path)

    assert text.retag_shingle_table(spark, legacy_spelling, legacy_path) is True
    # second run is a no-op: the migration is one-time
    assert text.retag_shingle_table(spark, legacy_spelling, legacy_path) is False

    # strict default passes now — the flag is dropped
    fam = text.ngram_family_from_shingles(spark, legacy_spelling, legacy_path)
    assert fam["ngram_jaccard_dedup"].count() > 0
    fam.release()


def test_edge_retag_end_to_end(spark, sf_dir, tmp_path):
    """Same flag-needed -> retag -> strict-pass cycle for the
    co-purchase edge table and its consumer."""
    from imperio_patitas_etl_spark.queries import affinity
    from imperio_patitas_etl_spark.queries.affinity import _EDGE_SOURCE_KEY

    link = tmp_path / "sf_alias"
    os.symlink(sf_dir, link)
    legacy_spelling = str(link)
    edge_path = str(tmp_path / "edges")
    affinity.materialize_edge_table(spark, legacy_spelling, edge_path)
    legacy = (
        spark.read.parquet(edge_path)
        .withMetadata("part_a", {_EDGE_SOURCE_KEY: legacy_spelling})
    )
    legacy_path = str(tmp_path / "edges_legacy")
    legacy.write.parquet(legacy_path)

    with pytest.raises(ValueError, match="allow_legacy_tag"):
        affinity.copurchase_family_from_edges(
            spark, legacy_spelling, legacy_path
        )
    assert affinity.retag_edge_table(spark, legacy_spelling, legacy_path) is True
    graph = affinity.copurchase_family_from_edges(
        spark, legacy_spelling, legacy_path
    )
    assert graph["triangle_count"].count() > 0
    graph.release()


def test_layout_retag_end_to_end(spark, sf_dir, tmp_path):
    """Same cycle for the IVF cell layout; the rebuild goes through
    materialize_cell_layout, so the upgraded table keeps its cell=
    partition layout (asserted via the partition column surviving)."""
    from imperio_patitas_etl_spark.queries import vector
    from imperio_patitas_etl_spark.queries.vector import _LAYOUT_SOURCE_KEY

    link = tmp_path / "sf_alias"
    os.symlink(sf_dir, link)
    legacy_spelling = str(link)
    layout_path = str(tmp_path / "layout")
    vector.materialize_cell_layout(spark, legacy_spelling, layout_path)
    legacy = (
        spark.read.parquet(layout_path)
        .withMetadata("vec_id", {_LAYOUT_SOURCE_KEY: legacy_spelling})
    )
    legacy_path = str(tmp_path / "layout_legacy")
    # the legacy re-write keeps the partitioning a pre-r12 writer used
    legacy.write.partitionBy("cell").parquet(legacy_path)

    with pytest.raises(ValueError, match="allow_legacy_tag"):
        vector.ann_ivf_from_layout(spark, legacy_spelling, legacy_path)
    assert vector.retag_cell_layout(spark, legacy_spelling, legacy_path) is True
    upgraded = vector.ann_ivf_from_layout(spark, legacy_spelling, legacy_path)
    assert upgraded.count() > 0
    # cell= partitioning survived the rebuild
    assert "cell" in {
        c for c in spark.read.parquet(legacy_path).columns
    }


def test_retag_cli_refuses_missing_table(tmp_path, monkeypatch):
    """The tools/retag.py entry validates args before any Spark spin-up."""
    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import retag as retag_cli

    sf = tmp_path / "sf"
    sf.mkdir()
    with pytest.raises(SystemExit):
        retag_cli.main(["shingles", str(sf), str(tmp_path / "missing")])


def test_retag_cli_dispatch_table_resolves(monkeypatch):
    """Every KINDS entry must name a real importable callable — a typo'd
    module or function name would otherwise surface only at migration
    time, after the operator has already typed the command."""
    import importlib

    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import retag as retag_cli

    for kind, (mod_name, fn_name) in retag_cli.KINDS.items():
        fn = getattr(importlib.import_module(mod_name), fn_name)
        assert callable(fn), (kind, mod_name, fn_name)


def test_retag_crash_mid_rebuild_leaves_legacy_table_intact(spark, tmp_path):
    """Crash safety (r15 review): the rebuild lands in a .retag.tmp
    sibling and is verified there BEFORE the swap, so a failing rebuild
    leaves the legacy table untouched and the helper re-runnable —
    pre-fix, the in-place mode=overwrite rebuild destroyed the only
    copy first."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)

    def _rebuild_boom(spark_, sf_dir_, path_):
        raise RuntimeError("executor lost mid-write")

    kwargs = dict(column="k", key="test_source", table_desc="test table")
    with pytest.raises(RuntimeError, match="executor lost"):
        retag_table(spark, legacy_spelling, out, rebuild=_rebuild_boom, **kwargs)
    # original rows + legacy tag untouched
    df = spark.read.parquet(out)
    assert df.count() == 3
    assert dict(df.schema["k"].metadata)["test_source"] == legacy_spelling
    # and a second attempt with a working rebuild completes the upgrade
    assert retag_table(spark, legacy_spelling, out, rebuild=_rebuild_tiny, **kwargs) is True
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)
    # no swap debris
    assert not os.path.exists(out + ".retag.tmp")
    assert not os.path.exists(out + ".retag.old")


def test_retag_bad_materializer_leaves_legacy_table_intact(spark, tmp_path):
    """A rebuild that writes but does NOT produce the strict tag is
    caught at the .retag.tmp sibling: the RuntimeError fires without
    touching the legacy table, and the tmp build is cleaned up."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)

    def _rebuild_untagged(spark_, sf_dir_, path_):
        spark_.range(3).toDF("k").write.mode("overwrite").parquet(path_)

    with pytest.raises(RuntimeError, match="not writing through tag_source"):
        retag_table(
            spark,
            legacy_spelling,
            out,
            column="k",
            key="test_source",
            table_desc="test table",
            rebuild=_rebuild_untagged,
        )
    df = spark.read.parquet(out)
    assert df.count() == 3
    assert dict(df.schema["k"].metadata)["test_source"] == legacy_spelling
    assert not os.path.exists(out + ".retag.tmp")


def test_retag_cli_refuses_missing_sf_dir(tmp_path, monkeypatch):
    """A typo'd sf_dir must error during argument handling — pre-fix it
    paid the JVM spin-up and was then misdiagnosed as a 'genuine source
    mismatch' on a healthy table."""
    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import retag as retag_cli

    table = tmp_path / "tbl"
    table.mkdir()
    with pytest.raises(SystemExit):
        retag_cli.main(["shingles", "/no/such/sf_dir", str(table)])


def test_retag_self_recovers_swap_crash_windows(spark, tmp_path):
    """A rerun self-recovers every swap crash window (r15 review):
    path-missing + verified tmp -> completed forward; stranded
    .retag.old next to a healthy path -> cleaned; path-missing + only
    .retag.old -> original restored. No window needs the docstring's
    manual 'rename it back'."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )

    # window A: crash BETWEEN the two swap renames — the original is
    # parked at .retag.old, the verified build sits at .retag.tmp,
    # nothing at path. The rerun completes the swap forward and then
    # re-validates against THIS call's sf_dir (already strict -> False).
    _rebuild_tiny(spark, legacy_spelling, out + ".retag.tmp")
    os.rename(out, out + ".retag.old")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)
    assert not os.path.exists(out + ".retag.tmp")
    assert not os.path.exists(out + ".retag.old")

    # window B: crash AFTER the swap, before cleanup — healthy strict
    # table plus a stranded .retag.old. The rerun sweeps the debris.
    os.mkdir(out + ".retag.old")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    assert not os.path.exists(out + ".retag.old")

    # window C: path missing with ONLY the parked original left (no
    # tmp) — the rerun restores it and proceeds normally.
    os.rename(out, out + ".retag.old")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    assert os.path.exists(out)
    assert not os.path.exists(out + ".retag.old")


def test_retag_cli_recovers_swap_crash_through_the_documented_command(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The recovery path must be reachable through the DOCUMENTED entry
    point: rerunning 'python tools/retag.py shingles <sf> <path>' after
    a crash between the swap renames (path missing, verified tmp +
    parked original present) completes the swap — pre-fix, the CLI's
    'no table at <path>' guard exited 2 before retag_table could
    self-recover."""
    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import retag as retag_cli

    link = tmp_path / "sf_alias"
    os.symlink(sf_dir, link)
    spelling = str(link)
    path = str(tmp_path / "shingles")
    # simulate window A: a verified (strict-tagged) tmp build plus the
    # parked original, nothing at path
    text.materialize_shingle_table(spark, spelling, path + ".retag.tmp")
    text.materialize_shingle_table(spark, spelling, path + ".retag.old")
    rc = retag_cli.main(["shingles", spelling, path])
    assert rc == 0
    assert os.path.isdir(path)
    assert not os.path.exists(path + ".retag.tmp")
    assert not os.path.exists(path + ".retag.old")
    # and the recovered table is strictly consumable without the flag
    fam = text.ngram_family_from_shingles(spark, spelling, path)
    assert fam["ngram_jaccard_dedup"].count() > 0
    fam.release()


def test_retag_sweeps_file_shaped_debris(spark, tmp_path):
    """A stray regular FILE at <path>.retag.old (partial copy, stray
    touch) must be swept like directory debris — pre-fix _remove_table
    silently skipped it and the swap's os.rename then failed forever."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    with open(out + ".retag.old", "w") as f:
        f.write("stray")
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    assert retag_table(spark, legacy_spelling, out, **kwargs) is True
    assert not os.path.exists(out + ".retag.old")
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)


def test_retag_noop_survives_unremovable_debris(spark, tmp_path, monkeypatch):
    """A healthy already-strict table must still no-op (False) when the
    stranded .retag.old cannot be removed — the debris sweep is
    best-effort, not a new failure mode on the no-op path."""
    import imperio_patitas_etl_spark.operators.provenance as prov

    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    assert retag_table(spark, legacy_spelling, out, **kwargs) is True  # now strict
    os.mkdir(out + ".retag.old")

    real = prov._remove_table

    def _boom(p):
        if p.endswith(".retag.old"):
            raise OSError("EBUSY: device or resource busy")
        real(p)

    monkeypatch.setattr(prov, "_remove_table", _boom)
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False


def test_retag_suffix_literals_pinned_between_cli_and_provenance(monkeypatch):
    """tools/retag.py repeats the swap sibling suffixes (it cannot
    import provenance without paying the pyspark import its fast paths
    avoid); this pin makes a future rename in either copy fail here
    instead of silently stranding the CLI's debris-recovery guard."""
    import imperio_patitas_etl_spark.operators.provenance as prov

    monkeypatch.syspath_prepend(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import retag as retag_cli

    assert retag_cli.TMP_SUFFIX == prov.RETAG_TMP_SUFFIX
    assert retag_cli.OLD_SUFFIX == prov.RETAG_OLD_SUFFIX


def test_retag_refuses_cleanly_when_only_junk_debris_remains(spark, tmp_path):
    """path missing + non-directory .retag.old: junk must never be
    installed AT the table path (the pre-fix restore renamed it there,
    converting sweepable debris into a blocking obstruction); instead
    the junk is swept and the call refuses with a clear ValueError."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    shutil.rmtree(out)
    with open(out + ".retag.old", "w") as f:
        f.write("stray")
    with pytest.raises(ValueError, match="non-table debris"):
        retag_table(spark, legacy_spelling, out, **kwargs)
    # junk swept, path still absent (nothing was installed there)
    assert not os.path.exists(out + ".retag.old")
    assert not os.path.exists(out)


def test_retag_fails_fast_on_unclearable_spot_before_the_rebuild(
    spark, tmp_path, monkeypatch
):
    """On the LEGACY path an unremovable .retag.old must refuse BEFORE
    the rebuild is paid (at real scale the rebuild is enormous; the
    pre-fix order ran it and then died on the unwrapped cleanup,
    dooming every rerun to repeat it)."""
    import imperio_patitas_etl_spark.operators.provenance as prov

    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    os.mkdir(out + ".retag.old")

    real = prov._remove_table

    def _boom(p):
        if p.endswith(".retag.old") and os.path.exists(p):
            raise OSError("EBUSY: device or resource busy")
        real(p)

    monkeypatch.setattr(prov, "_remove_table", _boom)
    rebuilds = []

    def _counting_rebuild(spark_, sf_dir_, path_):
        rebuilds.append(path_)
        _rebuild_tiny(spark_, sf_dir_, path_)

    with pytest.raises(RuntimeError, match="cannot clear the swap spot"):
        retag_table(
            spark,
            legacy_spelling,
            out,
            column="k",
            key="test_source",
            table_desc="test table",
            rebuild=_counting_rebuild,
        )
    assert rebuilds == []  # refused BEFORE paying the rebuild
    # the legacy table is untouched and the migration still possible
    assert dict(spark.read.parquet(out).schema["k"].metadata)["test_source"] == legacy_spelling


def test_retag_never_installs_a_symlink_tmp_at_the_table_path(spark, tmp_path):
    """A symlink-shaped .retag.tmp is debris (rebuild always writes a
    real parquet directory) — forward-completion must never rename it
    onto the table path, where it would serve whatever table it points
    at; it is swept and the call refuses."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    # a second, real table elsewhere — the symlink's target
    other = str(tmp_path / "other_tbl")
    _write_tiny(spark, other, legacy_spelling)
    shutil.rmtree(out)
    os.symlink(other, out + ".retag.tmp")
    with pytest.raises(ValueError, match="non-table debris"):
        retag_table(spark, legacy_spelling, out, **kwargs)
    assert not os.path.exists(out)  # nothing installed at the table path
    assert not os.path.lexists(out + ".retag.tmp")  # link swept...
    assert os.path.isdir(other)  # ...without touching its target


def test_retag_junk_tmp_only_state_refuses_cleanly(spark, tmp_path):
    """base missing + file-shaped .retag.tmp + NO .retag.old: must hit
    the clean refusal (sweeping the junk), not a raw path-missing
    Spark read error that strands the debris forever."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    shutil.rmtree(out)
    with open(out + ".retag.tmp", "w") as f:
        f.write("stray")
    with pytest.raises(ValueError, match="non-table debris"):
        retag_table(spark, legacy_spelling, out, **kwargs)
    assert not os.path.lexists(out + ".retag.tmp")


def test_retag_noop_sweeps_stranded_tmp_next_to_healthy_table(spark, tmp_path):
    """ADVICE r15: junk- or real-shaped .retag.tmp debris sitting next to
    an already-strict table must be reclaimed on the NO-OP path, the same
    way a stranded .retag.old is — not wait for a legacy migration that
    never comes."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    assert retag_table(spark, legacy_spelling, out, **kwargs) is True  # now strict

    # junk-shaped tmp (stray file)
    with open(out + ".retag.tmp", "w") as f:
        f.write("stray")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    assert not os.path.lexists(out + ".retag.tmp")

    # symlink-shaped tmp
    os.symlink(tmp_path / "sf", out + ".retag.tmp")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    assert not os.path.lexists(out + ".retag.tmp")

    # real-directory tmp (crash before the swap began)
    _rebuild_tiny(spark, legacy_spelling, out + ".retag.tmp")
    assert retag_table(spark, legacy_spelling, out, **kwargs) is False
    assert not os.path.lexists(out + ".retag.tmp")


def test_retag_mismatch_after_forward_complete_names_consumed_original(
    spark, tmp_path
):
    """ADVICE r15: when a rerun forward-completes a crashed swap and THEN
    refuses on a genuine source mismatch, the error must say the parked
    pre-crash original was consumed by that completion (it is no longer
    recoverable), so the operator isn't left believing a restore exists."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    # crash window A debris, but the crashed run targeted legacy_spelling
    _rebuild_tiny(spark, legacy_spelling, out + ".retag.tmp")
    os.rename(out, out + ".retag.old")
    # THIS call targets a different source → forward-complete, then refuse
    other = tmp_path / "other_sf"
    other.mkdir()
    with pytest.raises(ValueError, match="consumed the parked original"):
        retag_table(spark, str(other), out, **kwargs)
    # the forward-completed table is installed and strict for the
    # crashed run's own source — recoverable state, honestly described
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)
    # and a plain mismatch (no forward-complete) must NOT claim one
    with pytest.raises(ValueError) as ei:
        retag_table(spark, str(other), out, **kwargs)
    assert "consumed the parked original" not in str(ei.value)


def test_retag_mismatch_forward_complete_without_bak_claims_no_consumption(
    spark, tmp_path
):
    """ADVICE r16: 'consumed the parked original' must key on the parked
    original having actually EXISTED before the forward-completion
    cleanup — in the contrived state where the verified tmp is present
    but the .retag.old was removed out-of-band (so no original was ever
    consumed), the mismatch note must say no parked original was present
    instead of claiming a consumption that never happened."""
    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    # window-A tmp, but the parked original is gone (out-of-band removal)
    _rebuild_tiny(spark, legacy_spelling, out + ".retag.tmp")
    shutil.rmtree(out)
    assert not os.path.lexists(out + ".retag.old")
    other = tmp_path / "other_sf_nobak"
    other.mkdir()
    with pytest.raises(ValueError) as ei:
        retag_table(spark, str(other), out, **kwargs)
    msg = str(ei.value)
    assert "no parked original was present" in msg
    assert "consumed the parked original" not in msg
    # the forward-completed table is installed and strict for the
    # crashed run's own source
    got = dict(spark.read.parquet(out).schema["k"].metadata)["test_source"]
    assert got == canonical_source(legacy_spelling)


def test_retag_out_of_band_bak_after_bakless_forward_is_not_recoverable(
    spark, tmp_path, monkeypatch
):
    """ADVICE r17: the 'cleanup failed, original still recoverable'
    wording must key on the parked original having EXISTED at swap time
    (bak_existed), not merely on lexists(bak) at error time — a
    .retag.old that appears out-of-band AFTER a bak-less forward
    completion is unknown junk, and reporting it as the restorable
    pre-crash original would misdirect recovery. The out-of-band
    appearance is simulated by making the forward-completion cleanup
    itself drop junk at the bak path."""
    from imperio_patitas_etl_spark.operators import provenance

    legacy_spelling, out = _legacy_tiny_setup(spark, tmp_path)
    kwargs = dict(
        column="k",
        key="test_source",
        table_desc="test table",
        rebuild=_rebuild_tiny,
    )
    # window-A tmp, parked original gone (bak-less forward completion)
    _rebuild_tiny(spark, legacy_spelling, out + ".retag.tmp")
    shutil.rmtree(out)
    bak = out + ".retag.old"
    assert not os.path.lexists(bak)

    real_remove = provenance._remove_table

    def remove_then_out_of_band_bak(path):
        real_remove(path)
        if path == bak:  # the post-swap cleanup probe — junk lands now
            os.mkdir(bak)

    monkeypatch.setattr(provenance, "_remove_table", remove_then_out_of_band_bak)
    other = tmp_path / "other_sf_oob"
    other.mkdir()
    with pytest.raises(ValueError) as ei:
        retag_table(spark, str(other), out, **kwargs)
    msg = str(ei.value)
    assert "no parked original was present" in msg
    assert "still parked" not in msg
    assert "consumed the parked original" not in msg
