"""Extractor / file-listing tests — hermetic (injected fetchers, no
network), mirroring reference tests/unit/utils/test_extractor.py themes."""

from __future__ import annotations

import pytest

from gridded_etl_tools_spark.sources.extractor import (
    ExtractionError,
    FTPExtractor,
    HTTPExtractor,
    exponential_backoff,
    fetch_distributed,
    linear_backoff,
    parse_links,
    pool,
    retry_with_backoff,
)
from gridded_etl_tools_spark.sources.files import input_files, natural_key


def test_backoff_schedules():
    assert [exponential_backoff(a, 1.0) for a in (1, 2, 3)] == [1.0, 2.0, 4.0]
    assert [linear_backoff(a, 30.0) for a in (1, 2, 3)] == [30.0, 60.0, 90.0]


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    delays = []
    out = retry_with_backoff(flaky, retries=5, sleep=delays.append)
    assert out == "ok" and calls["n"] == 3
    assert delays == [1.0, 2.0]


def test_retry_exhausts_and_wraps():
    with pytest.raises(ExtractionError):
        retry_with_backoff(
            lambda: (_ for _ in ()).throw(OSError("down")),
            retries=2,
            sleep=lambda _: None,
        )


def test_retry_fatal_propagates_immediately():
    calls = {"n": 0}

    def fatal():
        calls["n"] += 1
        raise ValueError("bad request")

    with pytest.raises(ValueError):
        retry_with_backoff(
            fatal, retries=5, fatal_exceptions=(ValueError,), sleep=lambda _: None
        )
    assert calls["n"] == 1


def test_pool_semantics():
    assert pool([lambda: True, lambda: True]) is True
    assert pool([lambda: True, lambda: False]) is False
    assert pool([lambda: True, lambda: False], accept_any_success=True) is True
    assert pool([]) is True


def test_parse_links_filters_and_absolutizes():
    html = """
    <html><body>
      <a href="data/file_20240101.nc">a</a>
      <a href="data/file_20240102.nc">b</a>
      <a href="/other/readme.txt">c</a>
      <a href="https://elsewhere.example/x.nc">d</a>
    </body></html>
    """
    links = parse_links(
        html, "https://host.example/idx/", lambda u: u.endswith(".nc")
    )
    assert links == {
        "https://host.example/idx/data/file_20240101.nc",
        "https://host.example/idx/data/file_20240102.nc",
        "https://elsewhere.example/x.nc",
    }


def test_http_extractor_injected_fetch(tmp_path):
    pages = {"https://h/idx": b'<a href="f_1.nc">x</a><a href="f_2.nc">y</a>'}
    files = {"https://h/f_1.nc": b"AAA", "https://h/f_2.nc": b"BBB"}

    def get(url, timeout):
        if url in pages:
            return pages[url]
        return files[url]

    ex = HTTPExtractor(get=get)
    links = ex.get_links("https://h/idx")
    assert links == {"https://h/f_1.nc", "https://h/f_2.nc"}
    ok = ex.batch(
        sorted((u, str(tmp_path / u.rsplit("/", 1)[-1])) for u in links)
    )
    assert ok is True
    assert (tmp_path / "f_1.nc").read_bytes() == b"AAA"


def test_http_extractor_retries_transient(tmp_path):
    attempts = {"n": 0}

    def get(url, timeout):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise OSError("503")
        return b"DATA"

    ex = HTTPExtractor(get=get, backoff_factor=0.0)
    assert ex.request("https://h/f.nc", str(tmp_path / "f.nc")) is True
    assert attempts["n"] == 3


class FakeFTP:
    def __init__(self, listing, blobs):
        self.listing, self.blobs = listing, blobs

    def nlst(self):
        return self.listing

    def retrbinary(self, cmd, sink):
        sink(self.blobs[cmd.split(" ", 1)[1]])

    def quit(self):
        pass


def test_ftp_extractor_find_and_fetch(tmp_path):
    fake = FakeFTP(
        ["chirps_2024.nc", "chirps_2023.nc", "readme.txt"],
        {"chirps_2024.nc": b"NC24"},
    )
    ex = FTPExtractor(connect=lambda: fake)
    assert ex.find(r"chirps_\d{4}\.nc") == ["chirps_2023.nc", "chirps_2024.nc"]
    assert ex.request("chirps_2024.nc", str(tmp_path / "out.nc")) is True
    assert (tmp_path / "out.nc").read_bytes() == b"NC24"


def test_fetch_distributed(spark):
    items = [{"url": f"u{i}"} for i in range(10)]

    def fetch_one(item):
        return {"url": item["url"], "success": item["url"] != "u7"}

    out = fetch_distributed(spark, items, fetch_one)
    assert out.count() == 10
    assert out.filter("success").count() == 9


def test_natural_key_ordering():
    names = ["f10.nc", "f2.nc", "f1.nc"]
    assert sorted(names, key=natural_key) == ["f1.nc", "f2.nc", "f10.nc"]


def test_natural_sort_col_long_digit_runs(spark):
    """ADVICE r12: the 10-digit pad mis-ordered digit runs longer than
    10 digits when run lengths differed ('99999999999' sorted after
    '100000000000').  The pad is now 19 (covers int64 / epoch-nanos) so
    the column key agrees with the driver-side natural_key up to
    19-digit runs, and oversize_digit_run_col flags names the
    fixed-width key cannot order."""
    from pyspark.sql import functions as F

    from gridded_etl_tools_spark.sources.files import (
        natural_sort_col,
        oversize_digit_run_col,
    )

    names = [
        "f_100000000000.nc",   # 12 digits
        "f_99999999999.nc",    # 11 digits — used to sort after ^
        "f_2.nc",
        "f_1577836800000000000.nc",  # 19 digits (epoch nanos)
    ]
    df = spark.createDataFrame([(n,) for n in names], ["path"])
    got = [
        r.path
        for r in df.orderBy(natural_sort_col(F.col("path"))).collect()
    ]
    assert got == sorted(names, key=natural_key)
    flags = {
        r.path: r.big
        for r in df.select(
            "path", oversize_digit_run_col(F.col("path")).alias("big")
        ).collect()
    }
    assert not any(flags.values())  # 19-digit runs are in-range
    over = spark.createDataFrame(
        [("f_12345678901234567890.nc",)], ["path"]  # 20 digits
    )
    assert over.select(
        oversize_digit_run_col(F.col("path")).alias("big")
    ).first().big


def test_input_files_listing(spark, tmp_path):
    for name in ["b10.nc", "b2.nc", "a.nc", ".hidden.nc", "x.idx"]:
        (tmp_path / name).write_bytes(b"x")
    df = input_files(spark, str(tmp_path))
    names = [r["path"].rsplit("/", 1)[-1] for r in df.collect()]
    assert names == ["a.nc", "b2.nc", "b10.nc"]


def test_scan_gridded_mixed_format_directory(spark, tmp_path):
    """One scan over a directory holding NetCDF3 + NetCDF4 + GRIB1 +
    GRIB2 files decodes all four through per-file magic-byte dispatch
    (the reference's kerchunkify front door, utils/transform.py:119-279)."""
    import datetime as dt

    import numpy as np

    from gridded_etl_tools_spark.sources import grib1 as g1
    from gridded_etl_tools_spark.sources import grib2 as g2
    from gridded_etl_tools_spark.sources import hdf5 as h5
    from gridded_etl_tools_spark.sources import netcdf3 as nc
    from gridded_etl_tools_spark.sources.scan import scan_gridded, sniff_format

    lats = np.array([36.0, 36.5], dtype="f8")
    lons = np.array([-115.0, -114.5, -114.0], dtype="f8")
    vals = np.arange(6, dtype="f8").reshape(1, 2, 3)

    nc.write_netcdf3(
        str(tmp_path / "a.nc"),
        dims={"time": None, "latitude": 2, "longitude": 3},
        variables={
            "time": (("time",), nc.NC_DOUBLE, {}, np.array([0.0])),
            "latitude": (("latitude",), nc.NC_DOUBLE, {}, lats),
            "longitude": (("longitude",), nc.NC_DOUBLE, {}, lons),
            "precip": (("time", "latitude", "longitude"), nc.NC_DOUBLE, {}, vals),
        },
    )
    h5.write_hdf5(
        str(tmp_path / "b.nc4"),
        {
            "time": (("time",), np.array([1.0]), {}),
            "latitude": (("latitude",), lats, {}),
            "longitude": (("longitude",), lons, {}),
            "precip": (("time", "latitude", "longitude"), vals + 100, {}),
        },
    )
    g1.write_grib1(
        str(tmp_path / "c.grib"),
        [{
            "values": vals[0] + 200,
            "lats": lats, "lons": lons,
            "reference_time": dt.datetime(1970, 1, 3),
            "p1_hours": 0, "nbits": 16,
        }],
    )

    g2.write_grib2(
        str(tmp_path / "d.grib2"),
        [{
            "values": vals[0] + 300,
            "lats": lats, "lons": lons + 360.0,  # GRIB2 0-360 longitudes
            "reference_time": dt.datetime(1970, 1, 4),
            "forecast_hours": 0, "nbits": 16,
        }],
    )

    assert sniff_format((tmp_path / "a.nc").read_bytes()) == "netcdf3"
    assert sniff_format((tmp_path / "b.nc4").read_bytes()) == "hdf5"
    assert sniff_format((tmp_path / "c.grib").read_bytes()) == "grib1"
    assert sniff_format((tmp_path / "d.grib2").read_bytes()) == "grib2"

    df = scan_gridded(spark, str(tmp_path), "precip")
    rows = df.collect()
    assert len(rows) == 24
    # the store-level front door routes a raw-file directory here too,
    # and a SINGLE raw file (the most basic dataset shape)
    from gridded_etl_tools_spark.sources.scan import open_gridded

    assert open_gridded(spark, str(tmp_path), "precip").count() == 24
    assert open_gridded(spark, str(tmp_path / "a.nc"), "precip").count() == 6
    by_day = {}
    for r in rows:
        by_day.setdefault(round(r["time"], 6), []).append(r["value"])
    # nc day 0, nc4 day 1, grib1 1970-01-03 = day 2, grib2 day 3
    assert sorted(by_day) == [0.0, 1.0, 2.0, 3.0]
    assert sorted(by_day[3.0]) == [float(v) for v in range(300, 306)]
    assert sorted(by_day[0.0]) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert sorted(by_day[1.0])[0] == 100.0
    assert sorted(by_day[2.0])[0] == 200.0
