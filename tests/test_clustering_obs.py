"""r12: the connected-components convergence probes ride the eager
localCheckpoint job via ``observe`` instead of issuing a separate
aggregate job per round. These tests pin (a) the load-bearing runtime
assumption — observation metrics ARE collected by an eager
localCheckpoint's materialization job, without any further action — and
(b) the unchanged output contract on a graph that needs several rounds."""

from __future__ import annotations

import threading

from pyspark.sql import Observation
from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.clustering import (
    connected_components,
    connected_components_star,
)


def test_observation_fires_on_eager_local_checkpoint(spark):
    obs = Observation()
    df = (
        spark.range(100)
        .select((F.col("id") % 9).alias("v"))
        .observe(obs, F.sum(F.col("v").cast("decimal(38,0)")).alias("s"))
        .localCheckpoint(eager=True)
    )
    # obs.get blocks forever if the metric never fires — bound it so a
    # Spark behavior change fails the test instead of hanging the suite
    result: dict = {}
    t = threading.Thread(target=lambda: result.update(obs.get), daemon=True)
    t.start()
    t.join(timeout=30)
    assert result.get("s") is not None
    # sum of (id % 9) over 0..99: 11 full cycles (0..8 -> 36) + 0 for id=99
    assert int(result["s"]) == 11 * 36 + 0
    assert df.count() == 100  # the checkpointed frame is intact


def test_components_multi_round_contract_unchanged(spark):
    # a 7-chain plus a triangle plus a self-loop: label-prop needs several
    # rounds (diameter 6), star needs >1 large/small round
    rows = [(i, i + 1) for i in range(10, 16)] + [
        (1, 2),
        (2, 3),
        (3, 1),
        (42, 42),
    ]
    edges = spark.createDataFrame(rows, "src long, dst long")
    want = sorted(
        [(i, 10) for i in range(10, 17)]
        + [(1, 1), (2, 1), (3, 1), (42, 42)]
    )
    got_lp = sorted(map(tuple, connected_components(edges).collect()))
    got_st = sorted(map(tuple, connected_components_star(edges).collect()))
    assert got_lp == want
    assert got_st == want


def test_components_empty_edges(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty).collect() == []
    assert connected_components_star(empty).collect() == []
