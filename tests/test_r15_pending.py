"""The 11 entries that joined the registry when it unfroze in r15
(VERDICT r13 #4 / SCALING.md extension plan): built + oracle-gated a
round early, REGISTERED (window front) since r15. Exercised here at
sf0.001 with the same comparison the driver's correctness gate applies
(row count, column names, Arrow type classes, order-insensitive value
hash)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_correctness import (  # noqa: E402
    spark_to_arrow,
    table_lines,
    type_class,
    value_hash,
)

SF = "/root/testdata/sf0.001"


def test_r15_pending_disjoint_from_registry():
    pending = entry_mod.r15_pending()
    assert set(pending) == {
        "mm_decode_bmp",
        "mm_decode_wav",
        "mm_decode_jpeg",
        "mm_decode_tiff",
        "mm_decode_y4m",
        "mm_phash_neardup_real",
        "e27_cdf_matview_e2e",
        "e28_cdc_replica_sync",
        "e29_webdataset_roundtrip",
        "ann_filtered_ivf",
        "tx_minhash_cdf_incremental",
    }
    # the registry unfroze in r15: the pending entries are now REGISTERED
    # (window front) and their oracles merged into oracle_sql()
    qs = entry_mod.queries()
    assert set(pending) <= set(qs)
    assert set(pending) <= set(entry_mod.oracle_sql())
    assert len(qs) == 203
    # they lead the gate window (never driver-gated before r15)
    assert list(qs)[:11] == list(pending)


@pytest.mark.parametrize(
    "name",
    [
        "mm_decode_bmp",
        "mm_decode_wav",
        "mm_decode_jpeg",
        "mm_decode_tiff",
        "mm_decode_y4m",
        "mm_phash_neardup_real",
        "e27_cdf_matview_e2e",
        "e28_cdc_replica_sync",
        "e29_webdataset_roundtrip",
        "ann_filtered_ivf",
        "tx_minhash_cdf_incremental",
    ],
)
def test_r15_pending_matches_oracle(spark, name):
    fn, sql = entry_mod.r15_pending()[name]
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    stbl = spark_to_arrow(fn(spark, SF))
    otbl = con.execute(sql).fetch_arrow_table()
    assert stbl.num_rows == otbl.num_rows > 0
    cols = sorted(stbl.column_names)
    assert cols == sorted(otbl.column_names)
    for c in cols:
        sc = type_class(stbl.schema.field(c).type)
        oc = type_class(otbl.schema.field(c).type)
        assert sc == oc, f"{name}.{c}: spark {sc} != oracle {oc}"
    slines = table_lines(stbl, cols)
    olines = table_lines(otbl, cols)
    assert value_hash(slines) == value_hash(olines), (
        f"{name}: value mismatch; "
        f"spark-only={list(set(slines) - set(olines))[:3]} "
        f"oracle-only={list(set(olines) - set(slines))[:3]}"
    )
