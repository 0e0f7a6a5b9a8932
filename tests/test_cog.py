"""functions.cog: optional real COG codec + deterministic stub gate.

Parity target: lambdas/cogify/handler.py:14-44 (rio_cogeo deflate
profile, 256x256 blocks, cog/{collection}/{filename} target layout).
"""

from __future__ import annotations

import pytest

from maap_data_pipelines_spark.functions import cog


def _files_df(spark):
    rows = [
        ("tifs/a.tif", b"II*\x00fakebytesA", "collA", "a.tif"),
        ("tifs/b.tif", b"II*\x00fakebytesB", "collA", "b.tif"),
    ]
    return spark.createDataFrame(
        rows, "key string, content binary, collection string, filename string"
    )


def test_stub_gate_raises_without_allow_stub(spark):
    if cog.have_cog_codec():
        pytest.skip("real codec present; gate only guards its absence")
    with pytest.raises(NotImplementedError, match="allow_stub"):
        cog.cogify_binary(_files_df(spark), target_bucket="tgt")
    with pytest.raises(NotImplementedError):
        cog.cog_translate_bytes(b"II*\x00")


def test_cogify_binary_stub_path(spark):
    if cog.have_cog_codec():
        pytest.skip("real codec present; stub path is codec-absent only")
    rows = {
        r.key: r
        for r in cog.cogify_binary(
            _files_df(spark), target_bucket="tgt", allow_stub=True
        ).collect()
    }
    assert set(rows) == {"tifs/a.tif", "tifs/b.tif"}
    a = rows["tifs/a.tif"]
    assert a.status == "stubbed-cog"
    assert a.target_url == "s3://tgt/cog/collA/a.tif"
    # deterministic: same arithmetic the registered query's oracle checks
    assert a.out_bytes == cog.stub_cog_size("tifs/a.tif")


def test_real_codec_roundtrip(spark, tmp_path):
    """Runs only where rasterio + rio_cogeo exist (skipped otherwise)."""
    pytest.importorskip("rio_cogeo")
    rasterio = pytest.importorskip("rasterio")
    import numpy as np
    from rasterio.io import MemoryFile
    from rasterio.transform import from_origin

    data = (np.arange(64 * 64, dtype="uint8") % 255).reshape(1, 64, 64)
    with MemoryFile() as mem:
        with mem.open(
            driver="GTiff",
            width=64,
            height=64,
            count=1,
            dtype="uint8",
            transform=from_origin(0, 0, 1, 1),
        ) as ds:
            ds.write(data)
        tif_bytes = mem.read()

    out = cog.cog_translate_bytes(tif_bytes)
    assert out[:4] in (b"II*\x00", b"MM\x00*")  # TIFF magic
    df = spark.createDataFrame(
        [("k.tif", tif_bytes, "c", "k.tif")],
        "key string, content binary, collection string, filename string",
    )
    rows = cog.cogify_binary(df, target_bucket="tgt").collect()
    assert rows[0].status == "cog" and rows[0].out_bytes > 0
