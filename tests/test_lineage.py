"""Lineage, per-partition metrics, checkpoint/resume (north_rule)."""

import tempfile

import numpy as np

from richdem_spark.api import FillDepressions, TerrainAttribute
from richdem_spark.lineage import MetricsCollector, checkpoint, resume
from richdem_spark.ops.focal import apply_focal
from richdem_spark.kernels.terrain import slope_riserun
from richdem_spark.tiles import raster_from_array


def test_processing_history_lineage(spark):
    dem = np.random.default_rng(1).normal(10, 2, (20, 20))
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    filled = FillDepressions(tr)
    slope = TerrainAttribute(filled, "slope_riserun")
    hist = slope.meta.history
    assert len(hist) == 2
    assert "fill_depressions" in hist[0]
    assert "TA_slope_riserun" in hist[1]
    # timestamped like the reference's PROCESSING_HISTORY
    assert hist[0].split(" | ")[0].startswith("20")


def test_per_tile_metrics(spark):
    dem = np.random.default_rng(2).normal(10, 2, (24, 24))
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    mc = MetricsCollector(spark)
    out = apply_focal(
        tr, slope_riserun, kernel_kwargs={"nodata": None},
        op_name="slope_metrics_test", metrics=mc,
    )
    out.df.count()  # materialize
    rows = mc.rows()
    assert len(rows) == 9  # 3x3 tiles
    assert all(r[0] == "slope_metrics_test" for r in rows)
    assert {(r[1], r[2]) for r in rows} == {
        (x, y) for x in range(3) for y in range(3)
    }
    assert all(r[3] == 64 for r in rows)
    assert all(r[4] >= 0 for r in rows)
    df = mc.to_df(spark)
    assert df.count() == 9


def test_checkpoint_resume(spark):
    dem = np.random.default_rng(3).normal(10, 2, (16, 16))
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    filled = FillDepressions(tr)
    with tempfile.TemporaryDirectory() as d:
        ck = checkpoint(filled, f"{d}/ckpt")
        # resumed raster preserves data AND lineage
        again = resume(spark, f"{d}/ckpt")
        assert np.array_equal(ck.to_array(), again.to_array())
        assert again.meta.history == filled.meta.history
        assert np.array_equal(again.to_array(), filled.to_array())


def test_fill_op_metrics(spark):
    """The flagship fill records per-tile partition metrics
    (north_rule: per-partition lineage + metrics)."""
    dem = np.random.default_rng(4).normal(10, 2, (24, 24))
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    mc = MetricsCollector(spark)
    out = FillDepressions(tr, metrics=mc)
    out.df.count()
    rows = [r for r in mc.rows() if r[0] == "fill_round1"]
    assert len(rows) == 9
    assert all(r[3] == 64 and r[4] >= 0 for r in rows)
