"""Round-6 optimization: producers (rasterize, fill) carry border-strip
columns so halo_join assembles the halo exchange in the JVM instead of a
Python pass over every tile.  These tests pin the equivalence: the JVM
strip path must be byte-identical to the Python emission path on every
downstream focal consumer."""

import numpy as np
import pytest

from richdem_spark.api import FillDepressions, TerrainAttribute
from richdem_spark.ops.accum import flow_accumulation_d8_from_elev
from richdem_spark.tiles import HALO_STRIP_COLS, TILE_SCHEMA, TiledRaster
from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext


@pytest.fixture(scope="module")
def dem(spark):
    pages = synth_webtext(spark, 4000)
    return rasterize_pages(geocode(pages), grid=96, tile=32)


def _strip_cols(tr: TiledRaster) -> TiledRaster:
    """Drop the carried strips, forcing halo_join's Python path."""
    cols = [f.name for f in TILE_SCHEMA.fields]
    return TiledRaster(tr.df.select(*cols), tr.meta)


def test_rasterize_carries_strips(dem):
    assert set(HALO_STRIP_COLS).issubset(dem.df.columns)
    for r in dem.df.collect():
        a = np.frombuffer(r.data, dtype=np.float64).reshape(
            r.height, r.width)
        assert np.array_equal(
            np.frombuffer(r.hs_n, dtype=np.float64), a[0, :])
        assert np.array_equal(
            np.frombuffer(r.hs_s, dtype=np.float64), a[-1, :])
        assert np.array_equal(
            np.frombuffer(r.hs_w, dtype=np.float64), a[:, 0])
        assert np.array_equal(
            np.frombuffer(r.hs_e, dtype=np.float64), a[:, -1])


def test_fill_output_carries_strips(dem):
    filled = FillDepressions(dem)
    assert set(HALO_STRIP_COLS).issubset(filled.df.columns)
    for r in filled.df.collect():
        a = np.frombuffer(r.data, dtype=np.float64).reshape(
            r.height, r.width)
        assert np.array_equal(
            np.frombuffer(r.hs_n, dtype=np.float64), a[0, :])
        assert np.array_equal(
            np.frombuffer(r.hs_e, dtype=np.float64), a[:, -1])


def test_jvm_halo_equals_python_halo_slope(dem):
    jvm = TerrainAttribute(dem, "slope_riserun").to_array()
    py = TerrainAttribute(_strip_cols(dem), "slope_riserun").to_array()
    assert np.array_equal(jvm, py)


def test_jvm_halo_equals_python_halo_accum(dem):
    filled = FillDepressions(dem)
    jvm = flow_accumulation_d8_from_elev(filled).to_array()
    py = flow_accumulation_d8_from_elev(_strip_cols(filled)).to_array()
    assert np.array_equal(jvm, py)


def test_jvm_halo_equals_python_halo_eps_fill(dem):
    """Multi-tile epsilon fill routes through dirs + flats halo ops."""
    jvm = FillDepressions(dem, epsilon=True).to_array()
    py = FillDepressions(_strip_cols(dem), epsilon=True).to_array()
    assert np.array_equal(jvm, py)


def test_float32_dem_resolve_flats(spark):
    """Regression (round-6 review): the labels-halo raster must carry an
    int64 meta dtype — a float32 DEM's 4-byte itemsize would slice
    4-byte corners out of 8-byte label strips in the JVM halo path."""
    import numpy as np

    from richdem_spark.api import ResolveFlats
    from richdem_spark.tiles import raster_from_array

    a = np.ones((24, 24), dtype=np.float32)
    a[0, :] = 0.5  # drainable edge so the flat resolves
    tr = raster_from_array(spark, a, tile_w=8, tile_h=8)
    out = ResolveFlats(tr).to_array()
    assert out.shape == (24, 24)
