"""Z-order layout operator (operators/layout.py)."""

from pyspark.sql import functions as F

from ml_with_spark_streaming_spark.operators.layout import (
    interleave_expr,
    zorder_file_stats,
)


def _interleave_py(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_expr_matches_python(spark):
    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(vals, ["na", "nb"])
    got = df.selectExpr(
        "na", "nb", interleave_expr("na", "nb", 16, "spark") + " AS z"
    ).collect()
    for row in got:
        assert row["z"] == _interleave_py(row["na"], row["nb"])


def test_zorder_bounds_both_dims(spark):
    # dense 128x128 grid: linear layout leaves the b-span at the full
    # domain in every file; z-order shrinks BOTH spans
    rows = [(a, b) for a in range(128) for b in range(128)]
    df = spark.createDataFrame(rows, ["x", "y"])
    st = zorder_file_stats(df, "x", "y", bits=7, file_bits=4).collect()
    lin = [r for r in st if r["layout"] == "linear"]
    zo = [r for r in st if r["layout"] == "zorder"]
    assert len(lin) == 16 and len(zo) == 16
    lin_bspan = max(r["b_max"] - r["b_min"] for r in lin)
    zo_aspan = max(r["a_max"] - r["a_min"] for r in zo)
    zo_bspan = max(r["b_max"] - r["b_min"] for r in zo)
    assert lin_bspan == 127  # single-key sort: no pruning on y at all
    # 16 z-files over a 128x128 grid -> each file is a 32x64 tile
    assert zo_aspan <= 63 and zo_bspan <= 63
    # mass conservation
    assert sum(r["n_rows"] for r in zo) == len(rows)


def test_constant_key_domain_is_safe(spark):
    df = spark.createDataFrame([(5, i) for i in range(10)], ["x", "y"])
    st = zorder_file_stats(df, "x", "y", bits=4, file_bits=2)
    assert st.agg(F.sum("n_rows")).collect()[0][0] == 20
