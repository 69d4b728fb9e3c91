"""Pure-Python classic NetCDF reader: round-trip vs the fixture writer,
hand-crafted record-variable layout, and the REAL (non-injected) decode
path through the Spark binaryFile source (S1 end-to-end)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.sources.netcdf import (
    decode_netcdf_scene,
    read_scenes,
)
from asid_v2_data_pipeline_spark.sources.netcdf_classic import (
    ClassicNetCDF,
    write_classic,
)


def _scene_payload(side: int = 4, version: int = 1) -> bytes:
    """Two float vars + one int var on a (line, sample) grid; explicit
    _FillValue on one, default float fill on the other."""
    grid = np.arange(side * side, dtype=np.float32).reshape(side, side)
    prim = grid.copy()
    prim[0, 0] = -999.0  # explicit fill
    sec = grid * 2.0
    sec[1, 1] = 9.9692099683868690e36  # default NC_FLOAT fill
    ids = (grid.astype(np.int32) % 7) + 1
    return write_classic(
        {"line": side, "sample": side},
        {
            "sar_primary": (("line", "sample"), prim, {"_FillValue": np.float32(-999.0)}),
            "sar_secondary": (("line", "sample"), sec, {}),
            "polygon_id": (("line", "sample"), ids, {"units": "id"}),
        },
        gatts={"title": "fixture scene"},
        version=version,
    )


@pytest.mark.parametrize("version", [1, 2])
def test_reader_roundtrip(version):
    ds = ClassicNetCDF(_scene_payload(4, version))
    assert ds.dim_names == ["line", "sample"]
    assert ds.attrs["title"] == "fixture scene"
    assert ds.variables["polygon_id"].attrs["units"] == "id"
    assert ds.shape("sar_primary") == (4, 4)

    raw = ds.raw("sar_primary")
    assert raw.dtype == np.dtype(">f4") and raw[0, 0] == -999.0
    m = ds.masked("sar_primary")
    assert np.isnan(m[0, 0]) and m[3, 3] == 15.0  # explicit _FillValue
    m2 = ds.masked("sar_secondary")
    assert np.isnan(m2[1, 1]) and m2[0, 1] == 2.0  # default NC_FLOAT fill
    ids = ds.raw("polygon_id")
    assert ids.dtype == np.dtype(">i4") and ids[0, 1] == 2


def test_reader_record_variable():
    """Hand-crafted CDF-1 file with a record dimension (size 0 in the dim
    list, actual length = numrecs) — slabs interleave at stride recsize."""
    name = b"\x00\x00\x00\x01t\x00\x00\x00"  # "t" padded
    dim_list = struct.pack(">ii", 0x0A, 2)
    dim_list += name + struct.pack(">i", 0)  # record dim
    dim_list += struct.pack(">i", 1) + b"x\x00\x00\x00" + struct.pack(">i", 2)
    gatts = struct.pack(">ii", 0, 0)
    # one record var "v" of dims (t, x): vsize = 2*4 = 8
    var = struct.pack(">ii", 0x0B, 1)
    var += struct.pack(">i", 1) + b"v\x00\x00\x00"
    var += struct.pack(">i", 2) + struct.pack(">ii", 0, 1)  # dimids t,x
    var += struct.pack(">ii", 0, 0)  # no attrs
    header_wo_begin = b"CDF\x01" + struct.pack(">i", 3) + dim_list + gatts + var
    begin = len(header_wo_begin) + 12  # + nc_type, vsize, begin words
    var_full = var + struct.pack(">iii", 5, 8, begin)  # NC_FLOAT
    data = np.array([[0.0, 1.0], [10.0, 11.0], [20.0, 21.0]], dtype=">f4")
    payload = (
        b"CDF\x01" + struct.pack(">i", 3) + dim_list + gatts + var_full
        + data.tobytes()
    )
    ds = ClassicNetCDF(payload)
    assert ds.numrecs == 3 and ds.shape("v") == (3, 2)
    assert np.array_equal(ds.raw("v").astype(np.float64), data.astype(np.float64))


def test_reader_rejects_hdf5_and_garbage():
    with pytest.raises(ValueError, match="HDF5|classic"):
        ClassicNetCDF(b"\x89HDF\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not a classic"):
        ClassicNetCDF(b"\x00\x00\x00\x00")


def test_decode_netcdf_scene_real():
    pdf = decode_netcdf_scene(
        "20180410T084537_prep.nc", _scene_payload(4), ["sar_primary", "sar_secondary"]
    )
    assert len(pdf) == 2 * 16
    assert set(pdf["var"]) == {"sar_primary", "sar_secondary"}
    assert (pdf["scene"] == "20180410T084537").all()
    nulls = pdf[pdf["value"].isna()]
    assert {(r["var"], r["line"], r["sample"]) for _, r in nulls.iterrows()} == {
        ("sar_primary", 0, 0),
        ("sar_secondary", 1, 1),
    }


def test_read_scenes_real_decode_end_to_end(spark, tmp_path):
    """S1 with NO injected fake: real classic files through binaryFile +
    mapInPandas + the pure-Python parser."""
    for name, side in (("20180410T084537_a.nc", 4), ("20180110T120000_b.nc", 6)):
        (tmp_path / name).write_bytes(_scene_payload(side))
    df = read_scenes(spark, str(tmp_path), ["sar_primary", "sar_secondary"])
    assert df.count() == 2 * (16 + 36)
    assert df.filter(F.col("value").isNull()).count() == 4  # 2 fills/file
    got = (
        df.filter(
            (F.col("scene") == "20180410T084537")
            & (F.col("var") == "sar_primary")
            & (F.col("line") == 3)
            & (F.col("sample") == 3)
        ).collect()
    )
    assert got[0]["value"] == 15.0


def test_incremental_build_with_real_decoder(spark, tmp_path):
    """§3.1 outer loop end-to-end on real .nc bytes (no fake kernel)."""
    from asid_v2_data_pipeline_spark.config import PipelineConfig
    from asid_v2_data_pipeline_spark.plans.incremental import run_incremental_build

    src = tmp_path / "in"
    src.mkdir()
    (src / "20180410T084537_a.nc").write_bytes(_scene_payload(4))
    out, led = str(tmp_path / "px"), str(tmp_path / "led")
    cfg = PipelineConfig(
        window_sar=4, stride_sar=4, window_amsr2=2,
        names_sar=["sar_primary", "sar_secondary"],
    )
    n = run_incremental_build(spark, str(src), out, led, cfg)
    assert n == 1
    back = spark.read.parquet(out)
    assert back.count() == 2 * 16
    assert back.filter(F.col("value").isNull()).count() == 2  # the two fills


def test_read_scenes_quarantine_mode(spark, tmp_path):
    """r10: on_error='quarantine' — a corrupt scene in the directory
    becomes one sentinel reject row (var=REJECT_VAR) while the good
    scenes decode normally; the default on_error='raise' still fails
    the pass loudly."""
    from asid_v2_data_pipeline_spark.sources.netcdf import REJECT_VAR

    d = tmp_path / "scenes"
    d.mkdir()
    good = _scene_payload(side=4, version=1)
    (d / "sceneA_x.nc").write_bytes(good)
    (d / "sceneB_x.nc").write_bytes(b"CDF\x01" + good[4:20])  # truncated
    df = read_scenes(
        spark, str(d), ["sar_primary"], on_error="quarantine"
    )
    rows = df.collect()
    rejects = [r for r in rows if r["var"] == REJECT_VAR]
    pixels = [r for r in rows if r["var"] == "sar_primary"]
    assert [r["scene"] for r in rejects] == ["sceneB"]
    assert rejects[0]["line"] == -1 and rejects[0]["value"] is None
    assert len(pixels) == 16 and all(
        r["scene"] == "sceneA" for r in pixels
    )
    with pytest.raises(Exception):  # fail-fast default unchanged
        read_scenes(spark, str(d), ["sar_primary"]).collect()


def test_incremental_build_quarantines_poison_scene(spark, tmp_path):
    """r10: on_error='quarantine' — a corrupt scene contributes no
    pixels but its name commits to the ledger (terminal skip, no
    retry loop); the next run processes nothing.  The fail-fast
    default still raises."""
    from asid_v2_data_pipeline_spark.config import PipelineConfig
    from asid_v2_data_pipeline_spark.plans.incremental import (
        run_incremental_build,
    )

    src = tmp_path / "in"
    src.mkdir()
    good = _scene_payload(4)
    (src / "sceneA_x.nc").write_bytes(good)
    (src / "sceneB_x.nc").write_bytes(b"CDF\x01" + good[4:16])
    out, led = str(tmp_path / "px"), str(tmp_path / "led")
    cfg = PipelineConfig(
        window_sar=4, stride_sar=4, window_amsr2=2,
        names_sar=["sar_primary"],
    )
    with pytest.raises(Exception):
        run_incremental_build(spark, str(src), out, led, cfg)
    # ledger never committed on the failed run -> both still todo
    n = run_incremental_build(
        spark, str(src), out, led, cfg, on_error="quarantine"
    )
    assert n == 2  # both names consumed (one decoded, one quarantined)
    back = spark.read.parquet(out)
    assert back.select("scene").distinct().collect()[0]["scene"] == "sceneA"
    assert back.count() == 16
    # terminal: nothing to do on the next run — no poison retry loop
    assert run_incremental_build(
        spark, str(src), out, led, cfg, on_error="quarantine"
    ) == 0
