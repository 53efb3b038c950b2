"""EXIF metadata extraction and scrubbing for JPEG image corpora.

A web-scale image+caption corpus carries camera metadata — and with it
PII: GPS positions, serial-number-bearing maker notes, timestamps. A
training-data pipeline needs to (a) EXTRACT the useful fields (camera
make/model for stratification, orientation for correct decode, datetime
for dedup tie-breaking) and (b) SCRUB the privacy-bearing bytes before
the corpus ships. This module does both at the byte level — a JPEG
segment walk plus a TIFF IFD parse (TIFF 6.0 / CIPA DC-008 "Exif"
layouts, both public specs) — with NO pixel decode and NO re-encode:

* `parse_exif(jpeg)` — APP1/Exif → {make, model, datetime, orientation,
  gps_lat, gps_lon}. Fail-soft: malformed metadata returns None (a
  corrupt camera blob must never kill a 10^12-image run).
* `strip_metadata_jpeg(jpeg)` — drops APP1..APP15 + COM segments and
  nothing else; entropy-coded data is untouched, so decoded pixels are
  bit-identical before/after (tested) and the operation is idempotent.
* `build_exif_app1(...)` / `insert_app1(...)` — a minimal writer, used
  to synthesize deterministic test corpora and round-trip the parser.

Spark surface (both are narrow maps — header-only byte walks, zero
shuffle, no pixel decode; at 100 TB the cost is one scan):

* `with_exif(images)` → (id, exif_make, exif_model, exif_datetime,
  exif_orientation, gps_lat, gps_lon, has_gps) via mapInPandas.
* `scrub_metadata(images)` → the input with JPEG bytes rewritten
  metadata-free plus (meta_removed, bytes_saved) audit columns.

Reference analog: none (datasketches-cpp is a sketch library); this
extends the engine's curation family (operators/curation.py PII lane)
to the image payload axis.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# JPEG markers
_SOI = 0xD8
_SOS = 0xDA
_EOI = 0xD9
_COM = 0xFE
_APP0 = 0xE0
_APP15 = 0xEF
# segments with no length word
_STANDALONE = {0x01, *range(0xD0, 0xD8)}  # TEM, RST0..7

# TIFF field types → byte size
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# tags (TIFF 6.0 / Exif 2.x)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004


def _walk_segments(buf: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment before
    SOS; seg_start..seg_end spans the FF-marker byte through the end of
    the segment payload."""
    n = len(buf)
    if n < 4 or buf[0] != 0xFF or buf[1] != _SOI:
        return
    i = 2
    while i + 4 <= n:
        if buf[i] != 0xFF:
            return  # desynchronized — stop walking, keep the rest intact
        marker = buf[i + 1]
        if marker == _SOS or marker == _EOI:
            return
        if marker in _STANDALONE:
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        if ln < 2 or i + 2 + ln > n:
            return
        yield marker, i, i + 2 + ln
        i += 2 + ln


def _read_ifd(buf: bytes, tiff: int, off: int, bo: str) -> dict[int, tuple]:
    """One TIFF IFD → {tag: (type, count, raw_value_bytes)}; offsets are
    relative to the TIFF header start per the spec."""
    out: dict[int, tuple] = {}
    if tiff + off + 2 > len(buf):
        return out
    (count,) = struct.unpack_from(bo + "H", buf, tiff + off)
    base = tiff + off + 2
    for k in range(count):
        e = base + 12 * k
        if e + 12 > len(buf):
            break
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0 or cnt > 1 << 20:
            continue
        if size <= 4:
            raw = buf[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack_from(bo + "I", buf, e + 8)
            if tiff + voff + size > len(buf):
                continue
            raw = buf[tiff + voff : tiff + voff + size]
        out[tag] = (typ, cnt, raw)
    return out


def _ascii(entry: tuple | None) -> str | None:
    if entry is None or entry[0] != 2:
        return None
    return entry[2].split(b"\x00", 1)[0].decode("ascii", "replace")


def _short(entry: tuple | None, bo: str) -> int | None:
    if entry is None or entry[0] != 3 or len(entry[2]) < 2:
        return None
    return struct.unpack_from(bo + "H", entry[2], 0)[0]


def _long(entry: tuple | None, bo: str) -> int | None:
    if entry is None or entry[0] != 4 or len(entry[2]) < 4:
        return None
    return struct.unpack_from(bo + "I", entry[2], 0)[0]


def _dms(entry: tuple | None, bo: str) -> float | None:
    """3 RATIONALs (deg, min, sec) → decimal degrees."""
    if entry is None or entry[0] != 5 or entry[1] != 3 or len(entry[2]) < 24:
        return None
    vals = struct.unpack_from(bo + "6I", entry[2], 0)
    parts = []
    for i in range(3):
        num, den = vals[2 * i], vals[2 * i + 1]
        if den == 0:
            return None
        parts.append(num / den)
    return parts[0] + parts[1] / 60.0 + parts[2] / 3600.0


def parse_exif(buf: bytes) -> dict | None:
    """APP1/Exif metadata of a JPEG stream, or None when absent/corrupt.

    Returns {"make", "model", "datetime", "orientation", "gps_lat",
    "gps_lon"} (individual fields None when missing). Fail-soft by
    design: any structural damage short-circuits to None rather than
    raising — at corpus scale malformed camera metadata is routine."""
    try:
        for marker, s, e in _walk_segments(buf):
            if marker != _APP0 + 1:  # APP1
                continue
            payload = buf[s + 4 : e]
            if not payload.startswith(b"Exif\x00\x00"):
                continue
            tiff = s + 4 + 6
            if tiff + 8 > len(buf):
                return None
            order = buf[tiff : tiff + 2]
            if order == b"II":
                bo = "<"
            elif order == b"MM":
                bo = ">"
            else:
                return None
            magic, ifd0_off = struct.unpack_from(bo + "HI", buf, tiff + 2)
            if magic != 42:
                return None
            ifd0 = _read_ifd(buf, tiff, ifd0_off, bo)
            out = {
                "make": _ascii(ifd0.get(_TAG_MAKE)),
                "model": _ascii(ifd0.get(_TAG_MODEL)),
                "datetime": _ascii(ifd0.get(_TAG_DATETIME)),
                "orientation": _short(ifd0.get(_TAG_ORIENTATION), bo),
                "gps_lat": None,
                "gps_lon": None,
            }
            gps_off = _long(ifd0.get(_TAG_GPS_IFD), bo)
            if gps_off is not None:
                gps = _read_ifd(buf, tiff, gps_off, bo)
                lat = _dms(gps.get(_GPS_LAT), bo)
                lon = _dms(gps.get(_GPS_LON), bo)
                if lat is not None:
                    ref = _ascii(gps.get(_GPS_LAT_REF)) or "N"
                    out["gps_lat"] = -lat if ref.upper().startswith("S") else lat
                if lon is not None:
                    ref = _ascii(gps.get(_GPS_LON_REF)) or "E"
                    out["gps_lon"] = -lon if ref.upper().startswith("W") else lon
            return out
        return None
    except Exception:
        return None


def strip_metadata_jpeg(buf: bytes) -> bytes:
    """Remove PII-carrying APPn and COM segments; every other byte —
    including the entropy-coded scan data — passes through untouched, so
    the decoded pixels are bit-identical and no generation loss occurs.
    Segments that shape pixel INTERPRETATION are kept, or stripping
    would change rendered colors, violating the pixels-unchanged
    contract: APP0/JFIF (density), APP2 (ICC color profile) and APP14
    (Adobe color-transform flag — YCCK/CMYK JPEGs decode inverted
    without it). Neither carries PII. Non-JPEG input is returned
    unchanged."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != _SOI:
        return buf
    keep = {_APP0, _APP0 + 2, _APP0 + 14}  # JFIF, ICC, Adobe
    drop: list[tuple[int, int]] = []
    for marker, s, e in _walk_segments(buf):
        if ((_APP0 + 1) <= marker <= _APP15 and marker not in keep) \
                or marker == _COM:
            drop.append((s, e))
    if not drop:
        return buf
    parts = []
    pos = 0
    for s, e in drop:
        parts.append(buf[pos:s])
        pos = e
    parts.append(buf[pos:])
    return b"".join(parts)


# ---------------------------------------------------------------------------
# Minimal writer — synthesizes well-formed Exif APP1 segments so the
# parser and scrubber have deterministic producers to test against.
# ---------------------------------------------------------------------------


def _rat3(v: float) -> bytes:
    """Decimal degrees → 3 RATIONALs (deg, min, sec·10000/10000)."""
    v = abs(v)
    d = int(v)
    m = int((v - d) * 60)
    s = round(((v - d) * 60 - m) * 60 * 10000)
    return struct.pack("<6I", d, 1, m, 1, s, 10000)


def build_exif_app1(
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    orientation: int | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """A little-endian TIFF/Exif APP1 segment (marker through payload)
    carrying the given IFD0 fields and, when ``gps`` is set, a GPS IFD
    with signed-decimal → DMS-rational latitude/longitude."""
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, data)
    extra: list[bytes] = []

    def ascii_entry(tag: int, text: str) -> None:
        data = text.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(data), data))

    if make is not None:
        ascii_entry(_TAG_MAKE, make)
    if model is not None:
        ascii_entry(_TAG_MODEL, model)
    if orientation is not None:
        entries.append((_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation)))
    if datetime is not None:
        ascii_entry(_TAG_DATETIME, datetime)

    gps_entries: list[tuple[int, int, int, bytes]] = []
    if gps is not None:
        lat, lon = gps
        gps_entries = [
            (_GPS_LAT_REF, 2, 2, (b"S" if lat < 0 else b"N") + b"\x00"),
            (_GPS_LAT, 5, 3, _rat3(lat)),
            (_GPS_LON_REF, 2, 2, (b"W" if lon < 0 else b"E") + b"\x00"),
            (_GPS_LON, 5, 3, _rat3(lon)),
        ]

    def pack_ifd(ifd: list, ifd_off: int) -> bytes:
        """Serialize one IFD at TIFF-relative ifd_off; overflow values are
        appended immediately after the entry table."""
        ifd = sorted(ifd)
        n = len(ifd)
        tail_off = ifd_off + 2 + 12 * n + 4
        head = struct.pack("<H", n)
        tail = b""
        for tag, typ, cnt, data in ifd:
            if len(data) <= 4:
                val = data.ljust(4, b"\x00")
            else:
                val = struct.pack("<I", tail_off + len(tail))
                tail += data
            head += struct.pack("<HHI", tag, typ, cnt) + val
        head += struct.pack("<I", 0)  # next-IFD pointer
        return head + tail

    if gps_entries:
        # IFD0 gains the GPS pointer; GPS IFD lands right after IFD0
        probe = pack_ifd(
            entries + [(_TAG_GPS_IFD, 4, 1, struct.pack("<I", 0))], 8
        )
        gps_off = 8 + len(probe)
        entries.append((_TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_off)))
        tiff_body = pack_ifd(entries, 8) + pack_ifd(gps_entries, gps_off)
    else:
        tiff_body = pack_ifd(entries, 8)

    tiff = b"II" + struct.pack("<HI", 42, 8) + tiff_body
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment after SOI (and after APP0/JFIF when
    present, matching camera output ordering)."""
    if len(jpeg) < 2 or jpeg[0] != 0xFF or jpeg[1] != _SOI:
        raise ValueError("not a JPEG stream")
    pos = 2
    if len(jpeg) >= 6 and jpeg[2] == 0xFF and jpeg[3] == _APP0:
        (ln,) = struct.unpack_from(">H", jpeg, 4)
        pos = 4 + ln
    return jpeg[:pos] + app1 + jpeg[pos:]


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_EXIF_SCHEMA = (
    "id string, exif_make string, exif_model string, exif_datetime string, "
    "exif_orientation int, gps_lat double, gps_lon double, has_gps boolean"
)


def with_exif(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Per-image EXIF extraction: (id, exif_make, exif_model,
    exif_datetime, exif_orientation, gps_lat, gps_lon, has_gps).

    Narrow map over (id, bytes) — header-only byte walk, no pixel
    decode, no shuffle; images without parseable Exif produce NULL
    fields and has_gps = false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {
                "id": pdf[id_col].to_numpy(),
                "exif_make": [],
                "exif_model": [],
                "exif_datetime": [],
                "exif_orientation": [],
                "gps_lat": [],
                "gps_lon": [],
                "has_gps": [],
            }
            for b in pdf[bytes_col]:
                meta = parse_exif(bytes(b)) if b is not None else None
                meta = meta or {}
                rows["exif_make"].append(meta.get("make"))
                rows["exif_model"].append(meta.get("model"))
                rows["exif_datetime"].append(meta.get("datetime"))
                rows["exif_orientation"].append(meta.get("orientation"))
                rows["gps_lat"].append(meta.get("gps_lat"))
                rows["gps_lon"].append(meta.get("gps_lon"))
                rows["has_gps"].append(
                    meta.get("gps_lat") is not None
                    and meta.get("gps_lon") is not None
                )
            pdf_out = pd.DataFrame(rows)
            pdf_out["exif_orientation"] = pdf_out["exif_orientation"].astype(
                "Int32"
            )
            yield pdf_out

    return images.select(id_col, bytes_col).mapInPandas(run, _EXIF_SCHEMA)


def scrub_metadata(
    images: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Rewrite every JPEG's bytes metadata-free (APP1..APP15 + COM segments
    dropped; pixels untouched — no re-encode, no generation loss) and
    append audit columns: meta_removed (any segment dropped) and
    bytes_saved. Non-JPEG rows pass through with meta_removed = false.

    Keeps the full input schema, so it slots between scan and any
    downstream stage; still a narrow map (no shuffle)."""
    fields = images.schema.fields
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + ", meta_removed boolean, bytes_saved long"
    names = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            new_bytes, removed, saved = [], [], []
            is_jpeg = (
                pdf[fmt_col].astype(str).str.lower().isin(["jpeg", "jpg"])
                if fmt_col in pdf.columns
                else pd.Series([True] * len(pdf))
            )
            for b, j in zip(pdf[bytes_col], is_jpeg):
                if b is None or not j:
                    new_bytes.append(b)
                    removed.append(False)
                    saved.append(0)
                    continue
                raw = bytes(b)
                out = strip_metadata_jpeg(raw)
                new_bytes.append(out)
                removed.append(len(out) != len(raw))
                saved.append(len(raw) - len(out))
            pdf = pdf.copy()
            pdf[bytes_col] = new_bytes
            pdf["meta_removed"] = removed
            pdf["bytes_saved"] = np.asarray(saved, np.int64)
            yield pdf[names + ["meta_removed", "bytes_saved"]]

    return images.mapInPandas(run, out_schema)
