"""EXIF extraction + metadata scrubbing (operators/exif.py).

Covers: writer→parser round-trip (both GPS hemispheres), a hand-packed
big-endian (MM) fixture independent of the engine's writer, byte-exact
pixel preservation under scrubbing, fail-soft behavior on corrupt
metadata, idempotence, and the Spark surfaces (with_exif / scrub_metadata)
on a planted corpus.
"""

import struct

import numpy as np
import pytest

from datasketches_cpp_spark.operators.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
    scrub_metadata,
    strip_metadata_jpeg,
    with_exif,
)
from datasketches_cpp_spark.operators.jpegcodec import decode_jpeg, encode_jpeg


def _pixels(w, h, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), np.uint8)
    return base


def _jpeg(seed=7, w=32, h=24, quality=90):
    return encode_jpeg(_pixels(w, h, seed), w, h, quality=quality)


def test_roundtrip_full_metadata():
    app1 = build_exif_app1(
        make="ACME", model="Cam 9000", datetime="2024:05:06 07:08:09",
        orientation=6, gps=(37.7749, -122.4194),
    )
    jp = insert_app1(_jpeg(), app1)
    meta = parse_exif(jp)
    assert meta is not None
    assert meta["make"] == "ACME"
    assert meta["model"] == "Cam 9000"
    assert meta["datetime"] == "2024:05:06 07:08:09"
    assert meta["orientation"] == 6
    assert meta["gps_lat"] == pytest.approx(37.7749, abs=1e-4)
    assert meta["gps_lon"] == pytest.approx(-122.4194, abs=1e-4)


def test_roundtrip_southern_hemisphere():
    app1 = build_exif_app1(gps=(-33.8688, 151.2093))
    meta = parse_exif(insert_app1(_jpeg(), app1))
    assert meta["gps_lat"] == pytest.approx(-33.8688, abs=1e-4)
    assert meta["gps_lon"] == pytest.approx(151.2093, abs=1e-4)
    assert meta["make"] is None


def test_no_exif_returns_none():
    assert parse_exif(_jpeg()) is None
    assert parse_exif(b"") is None
    assert parse_exif(b"\x00" * 100) is None


def test_big_endian_fixture_hand_packed():
    """An MM (big-endian) TIFF body assembled by hand — independent of
    the engine's little-endian writer: IFD0 with Orientation=3 and
    Make='MM' (inline, 3 bytes incl. NUL)."""
    entries = b""
    # Make tag 0x010F, ASCII, count 3, value inline "MM\0" + pad
    entries += struct.pack(">HHI", 0x010F, 2, 3) + b"MM\x00\x00"
    # Orientation tag 0x0112, SHORT, count 1, value 3 (left-justified)
    entries += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 3) + b"\x00\x00"
    ifd0 = struct.pack(">H", 2) + entries + struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd0
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    meta = parse_exif(insert_app1(_jpeg(), app1))
    assert meta == {
        "make": "MM", "model": None, "datetime": None,
        "orientation": 3, "gps_lat": None, "gps_lon": None,
    }


def test_corrupt_metadata_fails_soft():
    jp = insert_app1(_jpeg(), build_exif_app1(make="X", gps=(1.0, 2.0)))
    # truncate inside the APP1 payload: parse must return None, not raise
    cut = jp[: jp.index(b"Exif\x00\x00") + 10]
    assert parse_exif(cut) is None
    # flip the TIFF magic
    bad = jp.replace(struct.pack("<H", 42), struct.pack("<H", 43), 1)
    assert parse_exif(bad) is None


def test_strip_removes_exif_and_preserves_pixels():
    base = _jpeg(seed=3)
    jp = insert_app1(base, build_exif_app1(make="ACME", gps=(10.0, 20.0)))
    clean = strip_metadata_jpeg(jp)
    assert parse_exif(clean) is None
    assert len(clean) < len(jp)
    # pixels bit-identical: only metadata segments were dropped
    px_before, w, h = decode_jpeg(jp)
    px_after, w2, h2 = decode_jpeg(clean)
    assert (w, h) == (w2, h2)
    assert np.array_equal(px_before, px_after)
    # idempotent
    assert strip_metadata_jpeg(clean) == clean


def test_strip_removes_com_keeps_app0():
    base = _jpeg(seed=4)
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    jp = base[:2] + com + base[2:]
    clean = strip_metadata_jpeg(jp)
    assert b"comment" not in clean
    # APP0/JFIF header survives
    assert clean[2:4] == b"\xff\xe0" or b"JFIF" in clean[:32]


def test_strip_non_jpeg_passthrough():
    assert strip_metadata_jpeg(b"not a jpeg") == b"not a jpeg"


PLANT = [
    # (image_id, make, gps)
    ("img_00", "ACME", (37.5, -122.25)),
    ("img_01", None, None),
    ("img_02", "Lumix", None),
    ("img_03", None, (-12.0, 44.5)),
    ("img_04", "ACME", (51.5, -0.125)),
    ("img_05", None, None),
]


def _planted_df(spark):
    rows = []
    for i, (iid, make, gps) in enumerate(PLANT):
        jp = _jpeg(seed=100 + i)
        if make is not None or gps is not None:
            jp = insert_app1(jp, build_exif_app1(make=make, gps=gps))
        rows.append((iid, bytearray(jp), 32, 24, "jpeg"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_with_exif_spark(spark):
    df = _planted_df(spark)
    got = {r["id"]: r for r in with_exif(df).collect()}
    assert len(got) == len(PLANT)
    for iid, make, gps in PLANT:
        r = got[iid]
        assert r["exif_make"] == make
        assert r["has_gps"] == (gps is not None)
        if gps is not None:
            assert r["gps_lat"] == pytest.approx(gps[0], abs=1e-4)
            assert r["gps_lon"] == pytest.approx(gps[1], abs=1e-4)


def test_scrub_metadata_spark(spark):
    df = _planted_df(spark)
    scrubbed = scrub_metadata(df)
    rows = scrubbed.collect()
    assert set(scrubbed.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "meta_removed", "bytes_saved"
    }
    expected_removed = {
        iid: (make is not None or gps is not None) for iid, make, gps in PLANT
    }
    for r in rows:
        assert r["meta_removed"] == expected_removed[r["image_id"]]
        assert (r["bytes_saved"] > 0) == expected_removed[r["image_id"]]
        assert parse_exif(bytes(r["bytes"])) is None
    # scrubbed corpus re-parses clean through the Spark extractor too
    post = with_exif(scrubbed).collect()
    assert all(not r["has_gps"] and r["exif_make"] is None for r in post)


def test_scrub_keeps_color_interpretation_segments():
    """APP2 (ICC profile) and APP14 (Adobe transform) shape decoded
    COLORS — scrubbing must keep them (they carry no PII) or the
    pixels-unchanged contract breaks for Adobe/ICC JPEGs."""
    import struct as _struct

    from datasketches_cpp_spark.operators.exif import strip_metadata_jpeg

    app2 = b"\xff\xe2" + _struct.pack(">H", 2 + 12) + b"ICC_PROFILE\x00"
    app14 = b"\xff\xee" + _struct.pack(">H", 2 + 12) + b"Adobe\x00" + b"\x00" * 6
    app1 = b"\xff\xe1" + _struct.pack(">H", 2 + 6) + b"Exif\x00\x00"
    com = b"\xff\xfe" + _struct.pack(">H", 2 + 4) + b"gps!"
    body = b"\xff\xdb" + _struct.pack(">H", 4) + b"\x00\x00"
    buf = b"\xff\xd8" + app1 + app2 + app14 + com + body + b"\xff\xd9"
    out = strip_metadata_jpeg(buf)
    assert b"ICC_PROFILE" in out and b"Adobe" in out
    assert b"Exif" not in out and b"gps!" not in out
