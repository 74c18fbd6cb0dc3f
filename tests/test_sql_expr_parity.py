"""r12 plan-construction fix: expressions formerly built node-by-node
through py4j (per-centroid / per-plane literal + lambda trees) are now a
single ``F.expr`` SQL parse. These tests pin the parsed expressions
result- AND dtype-identical to the bridge-built originals, reconstructed
here verbatim, so the fast path can never drift semantically."""

from __future__ import annotations

from pyspark.sql import functions as F

from faers_datalakehouse_spark.operators.coreset import _d2_to_literal
from faers_datalakehouse_spark.operators.dedup import _let, _md5_hash64
from faers_datalakehouse_spark.operators.similarity import (
    QUANT,
    _dot,
    _int_band_bucket,
    _plane_weight_int,
    _quantized,
)

SF001 = "/root/testdata/sf0.01"


def _old_band_bucket(emb_q, band: int, n_planes: int, dim: int):
    """The pre-r12 py4j-built form of ``_int_band_bucket``, verbatim."""
    bits = []
    for i in range(n_planes):
        p = band * n_planes + i
        plane = F.lit([_plane_weight_int(p, d) for d in range(dim)])
        proj = _dot(emb_q, plane)
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    guard = F.assert_true(
        F.size(emb_q) == dim,
        F.lit(f"embedding length must equal dim={dim} for LSH planes"),
    )
    return F.when(guard.isNull(), out)


def test_band_bucket_sql_parse_matches_bridge_built(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    e = emb.select("vec_id", _quantized(F.col("embedding")).alias("q_emb"))
    for band, n_planes in ((0, 10), (1, 10), (0, 8)):
        old = e.select(
            "vec_id", _old_band_bucket(F.col("q_emb"), band, n_planes, 64).alias("b")
        )
        new = e.select(
            "vec_id", _int_band_bucket("q_emb", band, n_planes, 64).alias("b")
        )
        assert old.schema == new.schema
        assert sorted(map(tuple, old.collect())) == sorted(
            map(tuple, new.collect())
        )


def _old_cells_of(cent_q, emb, n: int):
    """The pre-r12 py4j-built form of the IVF ``cells_of``, verbatim."""

    def build(q):
        entries = F.array(
            *[
                F.struct(
                    (-_dot(q, F.lit([int(v) for v in cvec]))).alias("negdot"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cvec in cent_q
            ]
        )
        return F.transform(
            F.slice(F.array_sort(entries), 1, n), lambda s: s["cid"]
        )

    return _let(_quantized(emb), build)


def test_ivf_cells_sql_parse_matches_bridge_built(spark):
    from faers_datalakehouse_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    cents_rows = (
        emb.select("vec_id", "embedding")
        .orderBy(_md5_hash64(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(16)
        .collect()
    )
    cent_q = sorted(
        (int(r["vec_id"]), [int(round(x * QUANT)) for x in r["embedding"]])
        for r in cents_rows
    )
    # the new builder is nested inside ivf_topk_neighbors; rebuild its SQL
    # here through the module helpers exactly as the operator does
    structs = ", ".join(
        f"named_struct('negdot', "
        f"-{sim._dot_sql_text('__q', sim._long_array_sql_text(cvec))}, "
        f"'cid', {int(cid)})"
        for cid, cvec in cent_q
    )
    quant = (
        f"transform(`embedding`, __e -> "
        f"CAST(round(__e * {QUANT}, 0) AS BIGINT))"
    )
    for n in (1, 2):
        new_col = F.expr(
            f"element_at(transform(array({quant}), "
            f"__q -> transform(slice(array_sort(array({structs})), 1, {n}), "
            f"__s -> __s.cid)), 1)"
        )
        old = emb.select(
            "vec_id", _old_cells_of(cent_q, F.col("embedding"), n).alias("c")
        )
        new = emb.select("vec_id", new_col.alias("c"))
        assert old.schema == new.schema
        assert old.collect() == new.collect()


def test_d2_literal_sql_parse_matches_bridge_built(spark):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    q = emb.select(
        "vec_id", _quantized(F.col("embedding")).alias("qe")
    )
    vec = [int(round(x * QUANT)) for x in emb.orderBy("vec_id").first()["embedding"]]
    old_col = F.aggregate(
        F.zip_with(
            F.col("qe"), F.lit([int(v) for v in vec]), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    old = q.select("vec_id", old_col.alias("d2"))
    new = q.select("vec_id", _d2_to_literal("qe", vec).alias("d2"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()
