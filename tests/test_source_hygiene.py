"""Source-hygiene grep pins.

The events table's ts column has drifted encodings across testdata
generations (TIMESTAMP(NANOS) vs micros); ``sources.tables.read_events``
is the ONE place that normalizes it (and restores the session conf it
touches). Every consumer must route through it — r9 ADVICE item 4 fixed
stattests/subsample, r10 VERDICT flagged the last straggler in
plans/showcase.py. This pin keeps the class closed: a new raw
``read.parquet(.../events.parquet)`` site fails here, not three rounds
later when the encoding drifts again.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "faers_datalakehouse_spark"
REPO = Path(__file__).resolve().parents[1]

# Batch-read call on the raw file. shutil.copy staging for streaming
# landing zones is fine (readStream applies an explicit schema), as are
# docstrings/comments mentioning the filename.
_RAW_READ = re.compile(r"read\.parquet\([^)]*events\.parquet")


def test_no_raw_events_parquet_reads_outside_tables():
    offenders = []
    files = list(PKG.rglob("*.py")) + [
        REPO / "__spark_entry__.py",
        REPO / "bench.py",
    ]
    for path in files:
        if path.name == "tables.py" and path.parent.name == "sources":
            continue
        for lineno, line in enumerate(
            path.read_text().splitlines(), start=1
        ):
            if _RAW_READ.search(line):
                offenders.append(f"{path}:{lineno}: {line.strip()}")
    assert not offenders, (
        "raw events.parquet batch reads must go through "
        "sources.tables.read_events:\n" + "\n".join(offenders)
    )


def test_stage_events_handles_file_and_directory_sources(tmp_path):
    """The driver testdata lands events.parquet as a single FILE; the
    scale-curve probe corpora are Spark-written DIRECTORIES of part
    files. Both must stage into a streaming landing zone (the r11
    streaming-probe fix)."""
    from faers_datalakehouse_spark.plans.showcase import stage_events

    # file form
    sf1 = tmp_path / "sf_file"
    sf1.mkdir()
    (sf1 / "events.parquet").write_bytes(b"PAR1")
    land1 = tmp_path / "land1"
    land1.mkdir()
    stage_events(str(sf1), str(land1 / "part-0.parquet"))
    assert (land1 / "part-0.parquet").read_bytes() == b"PAR1"

    # directory form
    sf2 = tmp_path / "sf_dir"
    (sf2 / "events.parquet").mkdir(parents=True)
    for i in range(3):
        (sf2 / "events.parquet" / f"part-{i:05d}.parquet").write_bytes(
            bytes([i])
        )
    land2 = tmp_path / "land2"
    land2.mkdir()
    stage_events(str(sf2), str(land2 / "part-0.parquet"))
    staged = sorted(p.name for p in land2.iterdir())
    assert staged == [
        "part-0-0.parquet",
        "part-0-1.parquet",
        "part-0-2.parquet",
    ]
