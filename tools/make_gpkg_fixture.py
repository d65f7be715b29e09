#!/usr/bin/env python3
"""One-time generator for the GeoPackage test fixtures committed under
src/test/resources/graft/. Run from the repo root:

    python3 tools/make_gpkg_fixture.py

Produces two SQLite files exercising the parts of the file format the
native reader (graft.sources.SqliteFile) must handle:

  small.gpkg  — default 4096-byte pages; gpkg_contents +
                gpkg_geometry_columns + a feature table with NULLs,
                negative ints, reals, a DATETIME (NUMERIC-affinity) column,
                GeoPackage geometry blobs (with AND without envelope), and
                one 9000-char text value that forces an overflow-page chain.
  deep.gpkg   — 512-byte pages, 3000 deterministic rows so the table
                B-tree has interior pages (subtree-split partitioning).

Everything is deterministic; re-running reproduces identical logical
content (file bytes may differ by sqlite version — the committed fixtures
are the contract).
"""
import os
import sqlite3
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft")
os.makedirs(OUT, exist_ok=True)


def gp_blob(x, y, srs=27700, envelope=False, geom="point"):
    """GeoPackage Binary: 'GP' magic, version 0, flags (bit0 = little-endian,
    bits1-3 = envelope indicator), int32 srs_id, optional envelope, then WKB."""
    flags = 0x01 | (0x02 if envelope else 0)
    hdr = b"GP" + bytes([0, flags]) + struct.pack("<i", srs)
    if envelope:
        hdr += struct.pack("<4d", x, x, y, y)  # minx, maxx, miny, maxy
    if geom == "point":
        wkb = struct.pack("<BI2d", 1, 1, x, y)
    else:  # 3-point linestring starting at (x, y)
        wkb = struct.pack("<BII", 1, 2, 3) + struct.pack("<6d", x, y, x + 1, y + 1, x + 2, y)
    return hdr + wkb


def make_small(path):
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE gpkg_contents (
          table_name TEXT NOT NULL PRIMARY KEY,
          data_type TEXT NOT NULL,
          identifier TEXT UNIQUE,
          description TEXT DEFAULT '',
          last_change DATETIME NOT NULL DEFAULT '2025-07-01T00:00:00Z',
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
          srs_id INTEGER
        );
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT NOT NULL,
          column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL,
          srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL,
          m TINYINT NOT NULL,
          CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name)
        );
        CREATE TABLE built_up (
          fid INTEGER PRIMARY KEY,
          name TEXT,
          area_ha REAL,
          pop INTEGER,
          observed DATETIME,
          note TEXT,
          geom POINT
        );
        """
    )
    con.execute(
        "INSERT INTO gpkg_contents VALUES ('built_up','features','Built Up Areas','OS test extract',"
        "'2025-07-01T00:00:00Z',0.0,0.0,100.0,100.0,27700)"
    )
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('built_up','geom','POINT',27700,0,0)")
    rows = [
        (1, "Alnwick", 402.5, 8116, "2025-01-02", "market town", gp_blob(10.0, 20.0)),
        (2, "Berwick", 351.25, 12043, "2025-01-03", None, gp_blob(30.5, 40.25, envelope=True)),
        (3, "Corbridge", None, -7, None, "negative pop sentinel", gp_blob(-5.0, -6.5)),
        (4, "Durham", 1024.0, 48069, "2025-02-11", "x" * 9000, gp_blob(55.0, 66.0, envelope=True)),
        (5, "Elsdon", 12.5, 0, "2025-03-01", "", None),
    ]
    con.executemany("INSERT INTO built_up VALUES (?,?,?,?,?,?,?)", rows)
    # real OS gpkg files carry an rtree spatial index: a VIRTUAL table
    # (rootpage 0 — must be skipped by the reader) plus ordinary shadow
    # tables; exercise both
    con.execute("CREATE VIRTUAL TABLE rtree_built_up_geom USING rtree(id, minx, maxx, miny, maxy)")
    con.execute("INSERT INTO rtree_built_up_geom VALUES (1, 9.0, 11.0, 19.0, 21.0)")
    # rowid-alias quirks: table-level PRIMARY KEY(fid) IS an alias (sqlite
    # stores NULL in the record for fid), column-level ...DESC is NOT
    con.execute("CREATE TABLE tpk (fid INTEGER, tag TEXT, PRIMARY KEY(fid))")
    con.executemany("INSERT INTO tpk VALUES (?,?)", [(7, "seven"), (9, "nine")])
    con.execute("CREATE TABLE dpk (fid INTEGER PRIMARY KEY DESC, tag TEXT)")
    con.executemany("INSERT INTO dpk VALUES (?,?)", [(7, "seven"), (9, "nine")])
    con.commit()
    con.close()


def make_deep(path):
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE wide (fid INTEGER PRIMARY KEY, v INTEGER, t TEXT)")
    con.executemany(
        "INSERT INTO wide VALUES (?,?,?)",
        [(i, (i * 7) % 1000, "row%05d" % i) for i in range(1, 3001)],
    )
    con.commit()
    con.close()


if __name__ == "__main__":
    make_small(os.path.join(OUT, "small.gpkg"))
    make_deep(os.path.join(OUT, "deep.gpkg"))
    for f in ("small.gpkg", "deep.gpkg"):
        p = os.path.join(OUT, f)
        print(f, os.path.getsize(p), "bytes")
