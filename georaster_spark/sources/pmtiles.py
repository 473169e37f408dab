"""Pure-stdlib PMTiles v3 archive reader + writer.

The reference reads ``.pmtiles`` raster archives through the ``pmt``
crate (``/root/reference/src/pmtiles.rs:14-34``: open by path, look a
tile up by (z, x, y), decode the tile image). Its fixture
(``data/ch-nw.pmtiles``) is not shipped, so — as with the TIFF layer —
the format is implemented from the public PMTiles v3 spec
(github.com/protomaps/PMTiles, spec/v3) with ``struct``/``zlib`` only,
and fixtures are engine-written.

What's implemented (the raster-read surface the reference uses):

- 127-byte v3 header (magic, section offsets/lengths, tile counts,
  compression ids, tile type, zoom/bounds/center);
- Hilbert-curve tile ids (``zxy_to_tileid`` / ``tileid_to_zxy``);
- directory varint serialization (delta tile ids, run lengths,
  lengths, offset back-references) for root AND leaf directories;
- gzip / none internal compression; gzip / none tile compression;
- a writer that clusters tile data in tile-id order, deduplicates
  identical tile bytes, and spills to leaf directories past a root
  budget — so the reader's leaf path is testable.

Lookup semantics mirror ``src/pmtiles.rs:21-34``: a hit returns the
tile bytes; a miss (tile id outside every entry/run) returns ``None``
(the reference raises ``PmtError::InvalidEntry``; callers that need
error parity check for ``None``).
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass

MAGIC = b"PMTiles"
VERSION = 3
HEADER_SIZE = 127

COMPRESSION_UNKNOWN = 0
COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2

TILETYPE_UNKNOWN = 0
TILETYPE_MVT = 1
TILETYPE_PNG = 2
TILETYPE_JPEG = 3
TILETYPE_WEBP = 4


class PmtilesError(ValueError):
    """Malformed or unsupported PMTiles bytes."""


# ------------------------------------------------------------- tile ids
def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """(z, x, y) → PMTiles tile id: cumulative tile count of all zooms
    below z, plus the Hilbert-curve index of (x, y) on the 2^z grid.
    """
    if z < 0 or not (0 <= x < (1 << z)) or not (0 <= y < (1 << z)):
        raise PmtilesError(f"tile coords out of range: z={z} x={x} y={y}")
    base = ((1 << (2 * z)) - 1) // 3  # sum of 4^i for i < z
    # xy → Hilbert d (iterative rotation, public-domain algorithm)
    rx = ry = 0
    d = 0
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return base + d


def tileid_to_zxy(tileid: int) -> tuple[int, int, int]:
    """Inverse of ``zxy_to_tileid``."""
    if tileid < 0:
        raise PmtilesError(f"negative tile id {tileid}")
    z = 0
    acc = 0
    while acc + (1 << (2 * z)) <= tileid:
        acc += 1 << (2 * z)
        z += 1
    d = tileid - acc
    x = y = 0
    s = 1
    n = 1 << z
    while s < n:
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s <<= 1
    return z, x, y


# -------------------------------------------------------------- varints
def _write_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        if pos >= len(data):
            raise PmtilesError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise PmtilesError("varint overflow")


# ---------------------------------------------------------- directories
@dataclass(frozen=True)
class Entry:
    tile_id: int
    offset: int
    length: int
    run_length: int  # 0 ⇒ leaf-directory pointer


def serialize_directory(entries: list[Entry]) -> bytes:
    """Spec layout: count, delta tile ids, run lengths, lengths, then
    offsets where 0 encodes "previous offset + previous length" and
    anything else encodes offset + 1."""
    out = bytearray()
    _write_varint(out, len(entries))
    last = 0
    for e in entries:
        _write_varint(out, e.tile_id - last)
        last = e.tile_id
    for e in entries:
        _write_varint(out, e.run_length)
    for e in entries:
        _write_varint(out, e.length)
    for i, e in enumerate(entries):
        if i > 0 and e.offset == entries[i - 1].offset + entries[i - 1].length:
            _write_varint(out, 0)
        else:
            _write_varint(out, e.offset + 1)
    return bytes(out)


def deserialize_directory(data: bytes) -> list[Entry]:
    n, pos = _read_varint(data, 0)
    tile_ids = []
    last = 0
    for _ in range(n):
        delta, pos = _read_varint(data, pos)
        last += delta
        tile_ids.append(last)
    run_lengths = []
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        run_lengths.append(v)
    lengths = []
    for _ in range(n):
        v, pos = _read_varint(data, pos)
        lengths.append(v)
    entries: list[Entry] = []
    for i in range(n):
        v, pos = _read_varint(data, pos)
        if v == 0:
            if i == 0:
                raise PmtilesError("first directory entry has no back-reference")
            off = entries[i - 1].offset + entries[i - 1].length
        else:
            off = v - 1
        entries.append(Entry(tile_ids[i], off, lengths[i], run_lengths[i]))
    if pos != len(data):
        raise PmtilesError("trailing bytes after directory")
    return entries


# -------------------------------------------------------------- header
@dataclass
class Header:
    root_offset: int
    root_length: int
    metadata_offset: int
    metadata_length: int
    leaf_offset: int
    leaf_length: int
    data_offset: int
    data_length: int
    n_addressed_tiles: int
    n_tile_entries: int
    n_tile_contents: int
    clustered: bool
    internal_compression: int
    tile_compression: int
    tile_type: int
    min_zoom: int
    max_zoom: int
    bounds_e7: tuple[int, int, int, int]  # min_lon, min_lat, max_lon, max_lat
    center_zoom: int
    center_e7: tuple[int, int]  # lon, lat

    def pack(self) -> bytes:
        return (
            MAGIC
            + struct.pack("<B", VERSION)
            + struct.pack(
                "<11Q",
                self.root_offset,
                self.root_length,
                self.metadata_offset,
                self.metadata_length,
                self.leaf_offset,
                self.leaf_length,
                self.data_offset,
                self.data_length,
                self.n_addressed_tiles,
                self.n_tile_entries,
                self.n_tile_contents,
            )
            + struct.pack(
                "<BBBBBB",
                1 if self.clustered else 0,
                self.internal_compression,
                self.tile_compression,
                self.tile_type,
                self.min_zoom,
                self.max_zoom,
            )
            + struct.pack("<4i", *self.bounds_e7)
            + struct.pack("<B", self.center_zoom)
            + struct.pack("<2i", *self.center_e7)
        )

    @classmethod
    def unpack(cls, data: bytes) -> "Header":
        if len(data) < HEADER_SIZE:
            raise PmtilesError("file shorter than the 127-byte header")
        if data[:7] != MAGIC:
            raise PmtilesError("not a PMTiles archive (bad magic)")
        if data[7] != VERSION:
            raise PmtilesError(f"unsupported PMTiles version {data[7]} (v3 only)")
        q = struct.unpack_from("<11Q", data, 8)
        b = struct.unpack_from("<BBBBBB", data, 96)
        bounds = struct.unpack_from("<4i", data, 102)
        (center_zoom,) = struct.unpack_from("<B", data, 118)
        center = struct.unpack_from("<2i", data, 119)
        return cls(
            root_offset=q[0], root_length=q[1],
            metadata_offset=q[2], metadata_length=q[3],
            leaf_offset=q[4], leaf_length=q[5],
            data_offset=q[6], data_length=q[7],
            n_addressed_tiles=q[8], n_tile_entries=q[9], n_tile_contents=q[10],
            clustered=bool(b[0]),
            internal_compression=b[1], tile_compression=b[2], tile_type=b[3],
            min_zoom=b[4], max_zoom=b[5],
            bounds_e7=tuple(bounds), center_zoom=center_zoom,
            center_e7=tuple(center),
        )


def _compress(data: bytes, method: int) -> bytes:
    if method == COMPRESSION_NONE:
        return data
    if method == COMPRESSION_GZIP:
        # mtime=0 → byte-stable fixtures
        return gzip.compress(data, compresslevel=6, mtime=0)
    raise PmtilesError(f"unsupported compression id {method}")


def _decompress(data: bytes, method: int) -> bytes:
    if method == COMPRESSION_NONE:
        return data
    if method == COMPRESSION_GZIP:
        return gzip.decompress(data)
    raise PmtilesError(f"unsupported compression id {method}")


# -------------------------------------------------------------- writer
def write_pmtiles(
    path: str,
    tiles: dict[tuple[int, int, int], bytes],
    tile_type: int = TILETYPE_PNG,
    tile_compression: int = COMPRESSION_NONE,
    internal_compression: int = COMPRESSION_GZIP,
    metadata_json: bytes = b"{}",
    max_root_entries: int = 256,
) -> None:
    """Write a clustered v3 archive. Identical tile bytes are stored
    once (``n_tile_contents`` < ``n_tile_entries``); entries past
    ``max_root_entries`` spill into leaf directories so the reader's
    two-level path gets exercised by fixtures."""
    if not tiles:
        raise PmtilesError("refusing to write an empty archive")
    by_id = sorted((zxy_to_tileid(z, x, y), b) for (z, x, y), b in tiles.items())
    # cluster tile data in tile-id order, dedup identical contents
    data = bytearray()
    seen: dict[bytes, tuple[int, int]] = {}
    entries: list[Entry] = []
    for tid, blob in by_id:
        comp = _compress(blob, tile_compression)
        if comp in seen:
            off, ln = seen[comp]
        else:
            off, ln = len(data), len(comp)
            data.extend(comp)
            seen[comp] = (off, ln)
        entries.append(Entry(tid, off, ln, 1))

    if len(entries) <= max_root_entries:
        root = _compress(serialize_directory(entries), internal_compression)
        leaves = b""
    else:
        # split into fixed-size leaves; root holds one pointer each
        root_entries: list[Entry] = []
        leaf_bytes = bytearray()
        for i in range(0, len(entries), max_root_entries):
            chunk = entries[i : i + max_root_entries]
            blob = _compress(serialize_directory(chunk), internal_compression)
            root_entries.append(
                Entry(chunk[0].tile_id, len(leaf_bytes), len(blob), 0)
            )
            leaf_bytes.extend(blob)
        root = _compress(serialize_directory(root_entries), internal_compression)
        leaves = bytes(leaf_bytes)

    meta = _compress(metadata_json, internal_compression)
    zooms = [z for (z, _x, _y) in tiles]
    root_offset = HEADER_SIZE
    metadata_offset = root_offset + len(root)
    leaf_offset = metadata_offset + len(meta)
    data_offset = leaf_offset + len(leaves)
    header = Header(
        root_offset=root_offset, root_length=len(root),
        metadata_offset=metadata_offset, metadata_length=len(meta),
        leaf_offset=leaf_offset, leaf_length=len(leaves),
        data_offset=data_offset, data_length=len(data),
        n_addressed_tiles=len(entries),
        n_tile_entries=len(entries),
        n_tile_contents=len(seen),
        clustered=True,
        internal_compression=internal_compression,
        tile_compression=tile_compression,
        tile_type=tile_type,
        min_zoom=min(zooms), max_zoom=max(zooms),
        bounds_e7=(-1800000000, -850511287, 1800000000, 850511287),
        center_zoom=min(zooms), center_e7=(0, 0),
    )
    with open(path, "wb") as f:
        f.write(header.pack())
        f.write(root)
        f.write(meta)
        f.write(leaves)
        f.write(data)


# -------------------------------------------------------------- reader
def _find_entry(entries: list[Entry], tile_id: int) -> Entry | None:
    """Binary search honoring run lengths; on miss inside a gap,
    fall back to the nearest preceding leaf pointer (spec semantics:
    a leaf covers [its tile_id, next entry's tile_id))."""
    lo, hi = 0, len(entries) - 1
    best_leaf: Entry | None = None
    while lo <= hi:
        mid = (lo + hi) // 2
        e = entries[mid]
        if tile_id < e.tile_id:
            hi = mid - 1
        else:
            if e.run_length == 0:
                best_leaf = e
                lo = mid + 1
            elif tile_id < e.tile_id + e.run_length:
                return e
            else:
                lo = mid + 1
    return best_leaf


class PmtilesReader:
    """Random-access tile lookup over a v3 archive — the engine twin
    of ``PmtilesRasterReader::open`` + ``get_tile``
    (``src/pmtiles.rs:14-34``)."""

    def __init__(self, path: str):
        self.path = path
        # ONE handle for the reader's lifetime: a tile lookup does
        # 2-3 ranged reads (root/leaf/data) and a scan does thousands
        # per archive — per-read open/close would dominate at lake
        # scale. CPython refcounting closes it promptly when the
        # reader drops; ``close()``/``with`` for deterministic cleanup.
        self._f = open(path, "rb")
        head = self._f.read(HEADER_SIZE)
        self.header = Header.unpack(head)
        self.root = deserialize_directory(
            _decompress(
                self._read(self.header.root_offset, self.header.root_length),
                self.header.internal_compression,
            )
        )

    def close(self) -> None:
        self._f.close()

    def __enter__(self) -> "PmtilesReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _read(self, offset: int, length: int) -> bytes:
        self._f.seek(offset)
        data = self._f.read(length)
        if len(data) != length:
            raise PmtilesError("truncated archive section")
        return data

    def metadata(self) -> bytes:
        return _decompress(
            self._read(self.header.metadata_offset, self.header.metadata_length),
            self.header.internal_compression,
        )

    def entries(self) -> list[Entry]:
        """All tile entries (leaves resolved) in tile-id order —
        drives the distributed scan plan."""
        out: list[Entry] = []
        for e in self.root:
            if e.run_length == 0:
                leaf = deserialize_directory(
                    _decompress(
                        self._read(self.header.leaf_offset + e.offset, e.length),
                        self.header.internal_compression,
                    )
                )
                out.extend(leaf)
            else:
                out.append(e)
        return out

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        """Tile bytes, or ``None`` for a missing tile (the reference
        raises ``InvalidEntry``, ``src/pmtiles.rs:28``)."""
        tile_id = zxy_to_tileid(z, x, y)
        entries = self.root
        for _depth in range(3):  # spec guarantees ≤ 2 directory levels
            e = _find_entry(entries, tile_id)
            if e is None:
                return None
            if e.run_length == 0:
                entries = deserialize_directory(
                    _decompress(
                        self._read(self.header.leaf_offset + e.offset, e.length),
                        self.header.internal_compression,
                    )
                )
                continue
            return _decompress(
                self._read(self.header.data_offset + e.offset, e.length),
                self.header.tile_compression,
            )
        raise PmtilesError("directory nesting exceeds spec depth")


# ----------------------------------------------------- scalar parity API
def decode_tile(blob: bytes):
    """Per-tile format sniff + decode — the engine twin of the
    reference's ``ImageReader::with_guessed_format().decode()``
    (``src/pmtiles.rs:30-32``), which trusts tile BYTES, not the
    archive's ``tile_type`` header field. PNG decodes through
    ``sources/png.py``; WebP (lossless VP8L) through
    ``sources/webp.py``. Anything else raises ``PmtilesError`` like
    the reference's ``ImageError`` surface."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from georaster_spark.sources.png import decode_png

        return decode_png(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from georaster_spark.sources.webp import decode_webp

        return decode_webp(blob)
    raise PmtilesError(
        "unsupported tile format (PNG and lossless-WebP tile bytes are "
        "decodable; the reference guesses per tile the same way, "
        "src/pmtiles.rs:30-32)"
    )


def _round_half_away(x: float) -> int:
    """Rust ``f64::round()``: half away from zero (Python ``round``
    is half-to-even and disagrees at exact .5)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def get_pixel_at(reader: PmtilesReader, z: int, lon: float, lat: float):
    """World coordinate → (r, g, b[, a]) through the tile pyramid —
    the engine twin of ``get_pixel_at`` (``src/pmtiles.rs:37-51``):
    ``tms.tile`` (floor web-mercator tiling), tile fetch, PNG decode,
    per-tile linear transform with top-origin y and ``.round()``
    snapping (``coord_to_pixel``, ``:53-69``). ``None`` for a missing
    tile (the reference raises ``InvalidEntry``)."""
    from georaster_spark import cells

    x, y = cells.tile_xy(lon, lat, z)
    blob = reader.get_tile(z, x, y)
    if blob is None:
        return None
    arr = decode_tile(blob)
    h, w = arr.shape[:2]
    lon0, lat0, lon1, lat1 = cells.cell_bounds(cells.zxy_to_cell(z, x, y))
    psx = (lon1 - lon0) / w
    psy = (lat1 - lat0) / h
    # Rust f64::round() rounds half AWAY FROM ZERO; Python round() is
    # banker's — they diverge on exact .5 offsets (reachable: tile
    # bounds and pixel sizes are exact binary fractions)
    px = _round_half_away((lon - lon0) / psx)
    py = _round_half_away((lat1 - lat) / psy)
    if not (0 <= px < w and 0 <= py < h):
        return None
    pix = arr[py, px]
    if arr.ndim == 2:
        v = int(pix)
        return (v, v, v)
    return tuple(int(c) for c in pix)


def terrarium_height_py(r: int, g: int, b: int) -> float:
    """Scalar terrarium decode — exact text of ``src/lib.rs:125-127``."""
    return (r * 256.0 + g + b / 255.0) - 32768.0


# ----------------------------------------------------- distributed scan
# tile pixel (163, 230) is the parity anchor: in fixture tile
# z12 (2128, 1438) it carries the Chasseral RGB whose terrarium height
# is the reference golden 1598.5294117647063 (src/pmtiles.rs:121-133).
ANCHOR_PX = 163
ANCHOR_PY = 230

_ENTRY_SCHEMA = (
    "archive string, z long, x long, y long, "
    "abs_offset long, length long, tile_compression long"
)
_STATS_SCHEMA = (
    "archive string, z long, x long, y long, width long, height long, "
    "n_px long, sum_r long, sum_g long, sum_b long, "
    "anchor_r long, anchor_g long, anchor_b long"
)


def pmtiles_entries_df(spark, paths):
    """Stage 1: archive paths → tile-entry table. Directory walks run
    in an Arrow kernel (executor-side ranged reads) so a catalog of
    many archives never opens a file on the driver — same two-stage
    shape as the TIFF ``chunk_plan_df``/``pixels_df`` pair.

    ``paths``: list of path strings, or a DataFrame with a ``path``
    column (the scale form)."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rd = PmtilesReader(p)
                base = rd.header.data_offset
                comp = rd.header.tile_compression
                for e in rd.entries():
                    for k in range(e.run_length):
                        z, x, y = tileid_to_zxy(e.tile_id + k)
                        rows.append(
                            (p, z, x, y, base + e.offset, e.length, comp)
                        )
            yield pd.DataFrame(
                rows,
                columns=[c.split()[0] for c in _ENTRY_SCHEMA.split(", ")],
            )

    if isinstance(paths, (list, tuple)):
        paths_df = spark.createDataFrame(
            [(p,) for p in paths], "path string"
        ).repartition(max(1, min(len(paths), 32)))
    else:
        paths_df = paths.select("path")
    return paths_df.mapInPandas(kernel, schema=_ENTRY_SCHEMA)


def tile_stats_df(
    spark,
    paths,
    tile_partitions: int | None = None,
    anchor_px: int = ANCHOR_PX,
    anchor_py: int = ANCHOR_PY,
):
    """Stage 2: entry table → per-tile decode stats. Each tile decodes
    independently (ranged read + inflate + numpy); only small typed
    rows leave the kernel — tile bytes never shuffle. Repartitioning
    the tiny entry table (not the blobs) spreads decode work."""
    import pandas as pd

    entries = pmtiles_entries_df(spark, paths)
    if tile_partitions:
        entries = entries.repartition(tile_partitions)

    def kernel(batches):
        handles: dict[str, object] = {}  # one open per archive per task

        def pread(path, offset, length):
            f = handles.get(path)
            if f is None:
                f = handles[path] = open(path, "rb")
            f.seek(offset)
            data = f.read(length)
            if len(data) != length:
                raise PmtilesError(
                    f"truncated read at {offset}+{length} in {path}"
                )
            return data

        for pdf in batches:
            out = {c.split()[0]: [] for c in _STATS_SCHEMA.split(", ")}
            for row in pdf.itertuples(index=False):
                blob = _decompress(
                    pread(row.archive, row.abs_offset, row.length),
                    int(row.tile_compression),
                )
                arr = decode_tile(blob)
                h, w = arr.shape[:2]
                if arr.ndim == 2:
                    rch = gch = bch = arr.astype("int64")
                else:
                    rch = arr[:, :, 0].astype("int64")
                    gch = arr[:, :, 1].astype("int64")
                    bch = arr[:, :, 2].astype("int64")
                anchor = (
                    (int(rch[anchor_py, anchor_px]),
                     int(gch[anchor_py, anchor_px]),
                     int(bch[anchor_py, anchor_px]))
                    if (w > anchor_px and h > anchor_py)
                    else (None, None, None)
                )
                vals = (
                    row.archive, row.z, row.x, row.y, w, h, w * h,
                    int(rch.sum()), int(gch.sum()), int(bch.sum()),
                    *anchor,
                )
                for k, v in zip(out, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)
        for f in handles.values():
            f.close()

    return entries.mapInPandas(kernel, schema=_STATS_SCHEMA)
