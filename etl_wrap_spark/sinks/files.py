"""Text-file writers (SURVEY §2.2 K13): CSV / fixed-width with the
reference's header controls — column ordering, columnskip, suppressed
header, distinct header separator (format_sepHead), prefix text
(format_beforeHeader), left-padded fixed format (format_padding) — cf.
reference Wrap/File.pm:493-611.

Two materializations:
- `write_csv_dir`: the scale path — a plain distributed
  `df.write.csv` directory (N part files, one per partition).
- `write_single_file`: reference parity — ONE named file. Data parts
  are written distributed, then concatenated driver-side with the
  header spliced in (the header/prefix controls live outside Spark's
  csv writer surface). Concatenation is streamed (never loads the
  dataset in memory), but the result is still one file — use only for
  export-sized results, exactly like the reference.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered(df: DataFrame, columns: Sequence[str], columnskip: set[str] | None = None) -> tuple[DataFrame, list[str]]:
    cols = [c for c in columns if not (columnskip and c in columnskip)]
    return df.select(*[F.col(c).cast("string").alias(c) for c in cols]), cols


def csv_line_expr(cols: Sequence[str], sep: str, quoted: bool = False):
    """One output line as a Column. Quoted mode doubles embedded quotes
    and wraps fields containing sep/quote/newline (RFC 4180)."""
    parts = []
    for c in cols:
        v = F.coalesce(F.col(c), F.lit(""))
        if quoted:
            needs = v.contains(sep) | v.contains('"') | v.contains("\n")
            quoted_v = F.concat(F.lit('"'), F.regexp_replace(v, '"', '""'), F.lit('"'))
            v = F.when(needs, quoted_v).otherwise(v)
        parts.append(v)
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, F.lit(sep), p)
    return out


def fixed_line_expr(cols: Sequence[str], padding: Sequence[int]):
    """Fixed-width line: each field left-aligned, right-padded/truncated
    to its width (the reference's sprintf('%-*s'), Wrap/File.pm:560)."""
    parts = [
        F.rpad(F.coalesce(F.col(c), F.lit("")), w, " ").substr(1, w)
        for c, w in zip(cols, padding)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def write_csv_dir(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    sep: str = "\t",
    header: bool = True,
    columnskip: set[str] | None = None,
    quoted: bool = False,
) -> None:
    """Distributed directory output — the 100-TB path."""
    out, cols = _ordered(df, columns, columnskip)
    (
        out.write.mode("overwrite")
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("quoteAll", str(quoted).lower())
        .option("emptyValue", "")
        .csv(path)
    )


def write_single_file(
    df: DataFrame,
    path: str,
    columns: Sequence[str],
    sep: str = "\t",
    columnskip: set[str] | None = None,
    quoted: bool = False,
    padding: Sequence[int] | None = None,
    suppress_header: bool = False,
    sep_head: str | None = None,
    before_header: str | None = None,
) -> None:
    """Reference-parity single named file (K13 full option surface)."""
    out, cols = _ordered(df, columns, columnskip)
    line = fixed_line_expr(cols, padding) if padding else csv_line_expr(cols, sep, quoted)
    tmp = tempfile.mkdtemp(prefix="etlw_csv_")
    try:
        out.select(line.alias("value")).write.mode("overwrite").text(os.path.join(tmp, "parts"))
        part_files = sorted(glob.glob(os.path.join(tmp, "parts", "part-*")))
        with open(path, "w", encoding="utf-8", newline="") as fh:
            if before_header:
                fh.write(before_header if before_header.endswith("\n") else before_header + "\n")
            if not suppress_header:
                hsep = sep_head if sep_head is not None else ("" if padding else sep)
                if padding:
                    hdr = "".join(h.ljust(w)[:w] for h, w in zip(cols, padding)) if hsep == "" else hsep.join(cols)
                else:
                    hdr = hsep.join(cols)
                fh.write(hdr + "\n")
            for pf in part_files:
                with open(pf, encoding="utf-8") as src:
                    shutil.copyfileobj(src, fh)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
