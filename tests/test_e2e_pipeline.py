"""End-to-end reference-parity pipeline (SURVEY §7.2, the canonical
Test/test.pl flow): config cascade → file pickup + gate → read
(skip 2, tab-sep, trim/normalize/rename) → type coercion → keyed
upsert into a live DB (Derby MERGE) → retry bookkeeping → export back
to a single named file (the writeFileFromDB direction)."""

import pytest
from pyspark.sql import functions as F

from etl_wrap_spark.functions import coerce
from etl_wrap_spark.plans.config import setup_config_merge
from etl_wrap_spark.plans.runner import ProcessedLedger, check_files
from etl_wrap_spark.sinks.files import write_single_file
from etl_wrap_spark.sources import jdbc
from etl_wrap_spark.sources.files import apply_read_pipeline, read_csv


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('e2e')}/db;create=true"
    jdbc.execute(
        spark, url,
        "CREATE TABLE loaded (id1 INT NOT NULL, id2 VARCHAR(10) NOT NULL, "
        "name VARCHAR(50), amount DOUBLE, asof DATE, PRIMARY KEY (id1, id2))",
    )
    jdbc.execute(
        spark, url,
        "CREATE TABLE loaded_stage (id1 INT, id2 VARCHAR(10), name VARCHAR(50), amount DOUBLE, asof DATE)",
    )
    return url


CONFIG_SITE = {"process": {"retrySeconds": 1}}
CONFIG_COMMON = {
    "File": {
        "format_sep": "\t",
        "format_skip": 2,
        "format_header": "ID1 ID2 Name Number Date",
        "format_targetheader": "id1 id2 name amount asof",
        "format_normalize": True,
        "format_thousandsep": ".",
        "format_decimalsep": ",",
    },
    "DB": {"table": "loaded", "primkey": ["id1", "id2"], "upsert": True},
}


def _write_input(path, rows):
    lines = ["junk header line", "generated 01.02.2023"] + [
        "\t".join(str(c) for c in r) for r in rows
    ]
    path.write_text("\n".join(lines) + "\n")


def _run_load(spark, db, src):
    cfg = setup_config_merge(CONFIG_SITE, CONFIG_COMMON, [{"File": {"filename": str(src)}}])[0]
    fcfg = cfg["File"]
    check_files([fcfg["filename"]])
    header = fcfg["format_header"].split()
    raw = read_csv(spark, fcfg["filename"], header=header, sep=fcfg["format_sep"], skip=fcfg["format_skip"])
    shaped = apply_read_pipeline(
        raw, header, targetheader=fcfg["format_targetheader"].split(),
        trim=True, normalize=fcfg["format_normalize"],
        thousandsep=fcfg["format_thousandsep"], decimalsep=fcfg["format_decimalsep"],
    )
    typed = shaped.select(
        F.col("id1").cast("int"),
        "id2",
        coerce.strip_newlines("name").alias("name"),
        coerce.coerce_number("amount").alias("amount"),
        coerce.coerce_datetime("asof").cast("date").alias("asof"),
    )
    jdbc.staged_upsert(typed, db, cfg["DB"]["table"], keys=cfg["DB"]["primkey"])


def test_initial_load_and_upsert(spark, db, tmp_path):
    src = tmp_path / "in.txt"
    _write_input(src, [
        (1, "A", " first ", "1.234,56", "24.12.2023"),
        (2, "B", "second", "7,5", "20231224103060"),  # SAP datetime, second 60
        (3, "C", "third", "N/A", "00000000"),  # null amount, zero date
    ])
    ledger = ProcessedLedger(str(tmp_path / "ledger.jsonl"))
    assert ledger.unprocessed([str(src)]) == [str(src)]
    _run_load(spark, db, src)
    ledger.mark([str(src)])

    rows = {
        (r["ID1"], r["ID2"]): r
        for r in jdbc.read_query(spark, db, "SELECT * FROM loaded").collect()
    }
    assert rows[(1, "A")]["NAME"] == "first"  # trimmed
    assert rows[(1, "A")]["AMOUNT"] == 1234.56  # German normalized
    assert str(rows[(1, "A")]["ASOF"]) == "2023-12-24"
    assert str(rows[(2, "B")]["ASOF"]) == "2023-12-24"  # SAP shape parsed
    assert rows[(3, "C")]["AMOUNT"] is None and rows[(3, "C")]["ASOF"] is None

    # ledger: nothing left to process
    assert ledger.unprocessed([str(src)]) == []

    # re-delivery with changed + new rows → MERGE semantics
    src2 = tmp_path / "in2.txt"
    _write_input(src2, [
        (1, "A", "first-v2", "2,0", "25.12.2023"),
        (4, "D", "fourth", "4,0", "26.12.2023"),
    ])
    _run_load(spark, db, src2)
    rows = {
        (r["ID1"], r["ID2"]): r
        for r in jdbc.read_query(spark, db, "SELECT * FROM loaded").collect()
    }
    assert len(rows) == 4
    assert rows[(1, "A")]["NAME"] == "first-v2" and rows[(1, "A")]["AMOUNT"] == 2.0
    assert rows[(2, "B")]["NAME"] == "second"  # untouched


def test_export_back_to_file(spark, db, tmp_path):
    """writeFileFromDB direction (Wrap.pm:452-481): query → ordered
    single-file csv with header controls."""
    df = jdbc.read_query(
        spark, db, "SELECT id1, id2, name, amount FROM loaded WHERE id1 <= 2"
    ).orderBy("ID1")
    out = tmp_path / "export.csv"
    write_single_file(df, str(out), ["ID1", "ID2", "NAME", "AMOUNT"], sep=";", before_header="# nightly export")
    content = out.read_text().splitlines()
    assert content[0] == "# nightly export"
    assert content[1] == "ID1;ID2;NAME;AMOUNT"
    assert content[2].startswith("1;A;first-v2;2.0")
    assert len(content) == 4
