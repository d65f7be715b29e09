#!/usr/bin/env python3
"""One-time generator for the pipeline-catalog test fixtures committed
under src/test/resources/graft/pipelines/. Run from the repo root:

    python3 tools/make_pipeline_fixtures.py

One fixture per catalog entry (graft.pipelines.Catalog), each mirroring
its real source's container format and column set:

  street_manager.zip   — zip of per-permit NESTED json (object_data.*)
  nhs_prescriptions.csv — EPD monthly CSV, post-March-2025 header
  code_point.gpkg      — GeoPackage with the Code-Point Open columns
  bods_gtfs.zip        — GTFS zip (agency/routes/stops/calendar/trips/
                          stop_times .txt members + one unrecognized)
  naptan_stops.csv     — NaPTAN LATEST_STOPS CSV, full 43-column header

Deterministic content; the committed fixtures are the contract.
"""
import csv, io, json, os, sqlite3, struct, zipfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources",
                   "graft", "pipelines")
os.makedirs(OUT, exist_ok=True)

# ------------------------------------------------------- street manager
def make_street_manager():
    rows = []
    for i in range(6):
        # row 5 is the COMPLETED WORK_STOP twin of permit -03: the permit
        # list models must exclude -03 from the in-progress list
        stopped = i == 5
        rows.append({
            "event_reference": 529770 + i,
            "event_type": "WORK_STOP" if stopped else (
                "WORK_UPDATED" if i % 2 else "WORK_START"),
            "event_time": f"2025-01-{10+i:02d}T08:0{i}:00.000Z",
            "object_type": "PERMIT",
            "object_reference": f"TSR1591199404915-{i:02d}",
            "version": 1 + i,
            "object_data": {
                "work_reference_number": f"TSR1591199404915",
                "work_category": ["Standard", "Minor", "Major"][i % 3],
                "work_status": "Works stopped" if stopped else "Works in progress",
                "work_status_ref": "completed" if stopped else "in_progress",
                "works_location_type": "Footway",
                "activity_type": "Remedial works",
                "permit_reference_number":
                    "TSR1591199404915-03" if stopped
                    else f"TSR1591199404915-{i:02d}",
                "permit_status": ["granted", "permit_modification_request"][i % 2],
                "promoter_swa_code": "7049",
                "promoter_organisation": "Promoter Org %d" % (i % 2),
                "highway_authority": "CITY OF WESTMINSTER",
                "highway_authority_swa_code": "5990",
                "works_location_coordinates": "LINESTRING(501251.53 222574.64,501305.92 222506.65)",
                "street_name": "Fake Street %d" % i,
                "usrn": str(8401426 + i),
                "road_category": str(3 + (i % 2)),
                "area_name": "LONDON",
                "traffic_management_type": "road_closure",
                "traffic_management_type_ref": "road_closure",
                "proposed_start_date": "2025-01-15T00:00:00.000Z",
                "proposed_end_date": "2025-01-20T00:00:00.000Z",
                "is_traffic_sensitive": "Yes" if i % 2 else "No",
                "is_deemed": "No",
                # note: several template columns deliberately absent
                # (town, collaborative_working, ...) — the street-manager
                # policy null-fills missing keys
            },
        })
    # two WELLBEING-eligible works (stg_{emergency,major}_works filters:
    # eligible work_category_ref, actual dates present, authority swa):
    # -06 completed immediate_emergency (4-day duration), -07 in-progress
    # major (duration defaults to 7) — both on the same LINESTRING, whose
    # centroid sits ~25 m from the NW1 1AA code-point row
    def wellbeing_row(i, ref_suffix, cat, cat_ref, stopped, actual_end):
        d = {
            "event_reference": 529770 + i,
            "event_type": "WORK_STOP" if stopped else "WORK_START",
            "event_time": f"2025-01-{10+i:02d}T08:0{i}:00.000Z",
            "object_type": "PERMIT",
            "object_reference": f"TSR1591199404915-{ref_suffix}",
            "version": 1 + i,
            "object_data": {
                "work_reference_number": "TSR1591199404915",
                "work_category": cat,
                "work_category_ref": cat_ref,
                "work_status": "Works stopped" if stopped else "Works in progress",
                "work_status_ref": "completed" if stopped else "in_progress",
                "works_location_type": "Footway",
                "activity_type": "Remedial works",
                "permit_reference_number": f"TSR1591199404915-{ref_suffix}",
                "permit_status": "granted",
                "promoter_swa_code": "7049",
                "promoter_organisation": "Promoter Org 0",
                "highway_authority": "CITY OF WESTMINSTER",
                "highway_authority_swa_code": "5990",
                "works_location_coordinates": "LINESTRING(501251.53 222574.64,501305.92 222506.65)",
                "street_name": "Fake Street %d" % i,
                "usrn": str(8401426 + i),
                "road_category": "3",
                "area_name": "LONDON",
                "traffic_management_type": "road_closure",
                "traffic_management_type_ref": "road_closure",
                "proposed_start_date": "2025-01-15T00:00:00.000Z",
                "proposed_end_date": "2025-01-20T00:00:00.000Z",
                "actual_start_date_time": "2025-01-05T08:00:00.000Z",
                "is_traffic_sensitive": "No",
                "is_deemed": "No",
            },
        }
        if actual_end:
            d["object_data"]["actual_end_date_time"] = actual_end
        return d
    rows.append(wellbeing_row(6, "06", "Immediate - emergency",
        "immediate_emergency", True, "2025-01-09T08:00:00.000Z"))
    rows.append(wellbeing_row(7, "07", "Major", "major", False, None))
    with zipfile.ZipFile(os.path.join(OUT, "street_manager.zip"), "w") as z:
        for i, r in enumerate(rows):
            z.writestr(f"permit_{i:04d}.json", json.dumps(r, sort_keys=True))

# ---------------------------------------------------- nhs prescriptions
NHS_HEADER = ["YEAR_MONTH","REGIONAL_OFFICE_NAME","REGIONAL_OFFICE_CODE",
  "ICB_NAME","ICB_CODE","PCO_NAME","PCO_CODE","PRACTICE_NAME","PRACTICE_CODE",
  "ADDRESS_1","ADDRESS_2","ADDRESS_3","ADDRESS_4","POSTCODE",
  "BNF_CHEMICAL_SUBSTANCE_CODE","BNF_CHEMICAL_SUBSTANCE",
  "BNF_PRESENTATION_CODE","BNF_PRESENTATION_NAME","BNF_CHAPTER_PLUS_CODE",
  "QUANTITY","ITEMS","TOTAL_QUANTITY","ADQ_USAGE","NIC","ACTUAL_COST",
  "UNIDENTIFIED","SNOMED_CODE"]

def make_nhs():
    with open(os.path.join(OUT, "nhs_prescriptions.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(NHS_HEADER)
        for i in range(8):
            w.writerow(["202505","LONDON","Y56","NHS NORTH WEST LONDON ICB","QRV",
              "BRENT PCN","U06674","PRACTICE %d" % i,"E8500%d" % i,
              "1 HIGH ROAD","WEMBLEY","","","HA9 6DE",
              "0407010%d" % i,"Paracetamol",
              "040701000BBABA0","Paracetamol 500mg tablets","04: CNS",
              "%.1f" % (28.0 + i), str(1 + i), "%.1f" % (28.0 * (1 + i)),
              "%.3f" % (0.5 * i), "%.2f" % (1.2 + i), "%.2f" % (1.1 + i),
              "N", str(322236009 + i)])

# ----------------------------------------------------------- code point
def gp_point(x, y, srs=27700):
    hdr = b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs)
    return hdr + struct.pack("<BI2d", 1, 1, x, y)

def make_code_point():
    path = os.path.join(OUT, "code_point.gpkg")
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.executescript("""
        CREATE TABLE gpkg_contents (
          table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
          identifier TEXT UNIQUE, description TEXT DEFAULT '',
          last_change DATETIME NOT NULL DEFAULT '2025-07-01T00:00:00Z',
          min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
        CREATE TABLE gpkg_geometry_columns (
          table_name TEXT NOT NULL, column_name TEXT NOT NULL,
          geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
          z TINYINT NOT NULL, m TINYINT NOT NULL);
        CREATE TABLE code_point (
          fid INTEGER PRIMARY KEY,
          postcode TEXT, positional_quality_indicator TEXT, country_code TEXT,
          nhs_regional_ha_code TEXT, nhs_ha_code TEXT, admin_county_code TEXT,
          admin_district_code TEXT, admin_ward_code TEXT, geom BLOB);
    """)
    con.execute("INSERT INTO gpkg_contents VALUES ('code_point','features','code_point','','2025-07-01T00:00:00Z',0,0,700000,1300000,27700)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('code_point','geom','POINT',27700,0,0)")
    rows = [
      ("AB10 1AB","10","E92000001","Y56","QRV","","E06000001","E05000001",394251.0, 806376.0),
      ("AB10 1AF","10","E92000001","Y56","QRV","","E06000001","E05000002",394181.0, 806429.0),
      ("SW1A 1AA","10","E92000001","Y56","QRV","E10000002","E09000033","E05013806",529090.0, 179645.0),
      ("HA9 6DE","20","E92000001","Y56","QRV","","E09000005","E05013573",519250.0, 185750.0),
      # ~25 m from the street_manager works centroid (501278.7, 222540.6):
      # the wellbeing radius join must find it
      ("NW1 1AA","10","E92000001","Y56","QRV","","E09000033","E05000999",501300.0, 222550.0),
    ]
    for i, (pc, pqi, cc, nrha, nha, acc, adc, awc, x, y) in enumerate(rows, 1):
        con.execute(
          "INSERT INTO code_point VALUES (?,?,?,?,?,?,?,?,?,?)",
          (i, pc, pqi, cc, nrha, nha, acc, adc, awc, gp_point(x, y)))
    con.commit(); con.close()

# ----------------------------------------------------------- bods gtfs
def make_bods():
    def txt(header, rows):
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(header)
        w.writerows(rows)
        return buf.getvalue()
    with zipfile.ZipFile(os.path.join(OUT, "bods_gtfs.zip"), "w") as z:
        z.writestr("agency.txt", txt(
          ["agency_id","agency_name","agency_url","agency_timezone","agency_lang","agency_phone","agency_noc"],
          [["O1","Op One","https://example.org","Europe/London","en","","ONE"],
           ["O2","Op Two","https://example.org","Europe/London","en","","TWO"]]))
        z.writestr("routes.txt", txt(
          ["route_id","agency_id","route_short_name","route_long_name","route_type"],
          [["R1","O1","12","High Rd - Station","3"],
           ["R2","O2","7","Circular","3"]]))
        z.writestr("stops.txt", txt(
          ["stop_id","stop_code","stop_name","stop_lat","stop_lon","wheelchair_boarding","location_type","parent_station","platform_code"],
          [["S1","c1","High Road","51.55","-0.30","0","","",""],
           ["S2","c2","Station","51.56","-0.29","1","","",""]]))
        z.writestr("calendar.txt", txt(
          ["service_id","monday","tuesday","wednesday","thursday","friday","saturday","sunday","start_date","end_date"],
          [["SV1","1","1","1","1","1","0","0","20250101","20251231"]]))
        z.writestr("trips.txt", txt(
          ["route_id","service_id","trip_id","trip_headsign","direction_id","block_id","shape_id","wheelchair_accessible","vehicle_journey_code"],
          [["R1","SV1","T1","Station","0","","SH1","1","VJ1"]]))
        z.writestr("stop_times.txt", txt(
          ["trip_id","arrival_time","departure_time","stop_id","stop_sequence","stop_headsign","pickup_type","drop_off_type","shape_dist_traveled","timepoint"],
          [["T1","08:00:00","08:00:00","S1","1","","0","0","","1"],
           ["T1","08:07:00","08:07:00","S2","2","","0","0","","1"]]))
        z.writestr("feed_info.txt", txt(
          ["feed_publisher_name","feed_publisher_url","feed_lang","feed_start_date","feed_end_date","feed_version"],
          [["Example Transit","https://example.org","en","20250101","20251231","2025-01"]]))
        z.writestr("shapes.txt", txt(
          ["shape_id","shape_pt_lat","shape_pt_lon","shape_pt_sequence","shape_dist_traveled"],
          [["SH1","51.55","-0.30","1",""],
           ["SH1","51.56","-0.29","2","1200"]]))
        # unrecognized member: the mapping must SKIP it, not fail
        z.writestr("readme.md", "not a gtfs table\n")

# --------------------------------------------------------------- naptan
NAPTAN_HEADER = ["ATCOCode","NaptanCode","PlateCode","CleardownCode","CommonName",
  "CommonNameLang","ShortCommonName","ShortCommonNameLang","Landmark","LandmarkLang",
  "Street","StreetLang","Crossing","CrossingLang","Indicator","IndicatorLang",
  "Bearing","NptgLocalityCode","LocalityName","ParentLocalityName",
  "GrandParentLocalityName","Town","TownLang","Suburb","SuburbLang","LocalityCentre",
  "GridType","Easting","Northing","Longitude","Latitude","StopType","BusStopType",
  "TimingStatus","DefaultWaitTime","Notes","NotesLang","AdministrativeAreaCode",
  "CreationDateTime","ModificationDateTime","RevisionNumber","Modification","Status"]

def make_naptan():
    with open(os.path.join(OUT, "naptan_stops.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(NAPTAN_HEADER)
        for i in range(6):
            w.writerow(["490000235%d" % i,"53272%d" % i,"","","Stop %d" % i,"en",
              "Stop %d" % i,"en","","","High Road","en","","","Stop %s" % "ABCDEF"[i],
              "en","SW","E0034778","Wembley","","","London","en","","","0","UKOS",
              "51925%d" % i,"18575%d" % i,"-0.2966%d" % i,"51.5566%d" % i,"BCT","MKD",
              "OTH","","","","082","2020-01-0%dT12:00:00" % (i+1),
              "2024-06-0%dT09:30:00" % (i+1),str(i),"rev","active"])

# ---------------------------------------------------- cadent underground
CADENT_HEADER = ["Geo Point","Geo Shape","TYPE","PRESSURE","MATERIAL","DIAMETER",
  "DIAM_UNIT","CARR_MAT","CARR_DIA","CARR_DI_UN","ASSET_ID","DEPTH","AG_IND",
  "INST_DATE"]

def make_cadent():
    rows = [
      ["51.5, -0.125", '{"type": "LineString", "coordinates": [[-0.125, 51.5], [-0.126, 51.501]]}',
       "MAIN","LP","PE","63","mm","","","","A0001","0.9","B","1998-04-01"],
      ["52.25, -1.5", '{"type": "Point", "coordinates": [-1.5, 52.25]}',
       "SERVICE","MP","ST","90","mm","","","","A0002","1.1","B","2001-09-12"],
      ["53.0, -2.0", '{"type": "Polygon", "coordinates": [[[-2.0, 53.0], [-1.9, 53.0], [-1.9, 53.1], [-2.0, 53.0]]]}',
       "MAIN","IP","PE","125","mm","","","","A0003","0.6","A","2010-01-20"],
      ["not-a-point", "{malformed json",
       "MAIN","LP","CI","4","in","","","","A0004","","B",""],
      # a Multi* shape: pipe networks export these routinely; the
      # reference's shapely shape().wkt renders them, so must the load
      ["53.5, -2.5", '{"type": "MultiLineString", "coordinates": [[[-2.5, 53.5], [-2.6, 53.6]], [[-2.7, 53.7], [-2.8, 53.8]]]}',
       "MAIN","HP","ST","200","mm","","","","A0005","1.4","A","2015-06-30"],
    ]
    with open(os.path.join(OUT, "cadent_underground.csv"), "w", newline="") as f:
        w = csv.writer(f); w.writerow(CADENT_HEADER); w.writerows(rows)

# ------------------------------------------------------- dft road stats
DFT_COLS = ["ONS Area Code","Region","Centrally Managed Motorways",
  "Locally Managed Motorways","All Motorways",
  "Centrally Managed Rural 'A' Roads","Centrally Managed Urban 'A' Roads",
  "Locally Managed Rural 'A' Roads","Locally Managed Urban 'A' Roads",
  "All 'A' Roads","Major Centrally Managed Roads",
  "Major Locally Managed Roads","All Major Roads","Rural (B) Roads",
  "Urban (B) Roads","Rural C and U Roads","Urban C and U Roads",
  "All Minor Roads","Total Road Length","Notes"]

def ods_cell(v, numeric=False):
    if v is None or v == "":
        return "<table:table-cell/>"
    if numeric:
        return ('<table:table-cell office:value-type="float" office:value="%s">'
                "<text:p>%s</text:p></table:table-cell>" % (v, v))
    return ('<table:table-cell office:value-type="string"><text:p>%s</text:p>'
            "</table:table-cell>" % v)

def ods_row(cells):
    return "<table:table-row>%s</table:table-row>" % "".join(cells)

def make_ods(path, sheet_name, header_row, data_rows):
    preamble = [ods_row([ods_cell("Road lengths (miles): %s" % sheet_name)])]
    for _ in range(header_row - 1):
        preamble.append(ods_row([ods_cell(None)]))
    header = ods_row([ods_cell(c) for c in DFT_COLS])
    body = [ods_row([ods_cell(v, numeric=isinstance(v, (int, float))) for v in r])
            for r in data_rows]
    content = (
      '<office:document-content xmlns:office="urn:o" xmlns:table="urn:t" '
      'xmlns:text="urn:x"><office:body><office:spreadsheet>'
      '<table:table table:name="Notes"><table:table-row>'
      '<table:table-cell office:value-type="string"><text:p>notes sheet'
      "</text:p></table:table-cell></table:table-row></table:table>"
      '<table:table table:name="%s">%s%s%s</table:table>'
      "</office:spreadsheet></office:body></office:document-content>"
      % (sheet_name, "".join(preamble), header, "".join(body)))
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)

def make_dft():
    d = os.path.join(OUT, "dft_road_stats")
    os.makedirs(d, exist_ok=True)
    make_ods(os.path.join(d, "rdl0101.ods"), "RDL0101a", 6, [
      ["E06000001","Hartlepool", 0, 0, 0, 10.2, 5.1, 8.0, 6.0, 29.3,
       0, 29.3, 29.3, 12.0, 7.5, 55.0, 44.0, 118.5, 147.8, ""],
      ["E06000002","Middlesbrough", 1.5, 0, 1.5, 9.9, 12.3, 4.4, 9.1, 35.7,
       1.5, 35.7, 37.2, 10.1, 9.9, 60.2, 70.3, 150.5, 187.7, "note a"]])
    make_ods(os.path.join(d, "rdl0202.ods"), "RDL0202a", 7, [
      ["E92000001","England", 1900.0, 50.0, 1950.0, 6400.0, 1200.0, 8000.0,
       3200.0, 18800.0, 8350.0, 12400.0, 20750.0, 9000.0, 5100.0, 98000.0,
       52000.0, 164100.0, 184850.0, ""]])

# --------------------------------------------------------- nspl archive
def make_nspl():
    hdr = ["pcd","pcd2","pcds","dointr","doterm","usertype","oseast1m",
      "osnrth1m","osgrdind","oa21","cty","ced","laua","ward","nhser","ctry",
      "rgn","pcon","ttwa","itl","park","lsoa21","msoa21","wz11","sicbl",
      "bua24","ruc21","oac11","lat","long","lep1","lep2","pfa","imd","icb"]
    buf = io.StringIO(); w = csv.writer(buf); w.writerow(hdr)
    for i in range(5):
        w.writerow(["AB1 0A%d" % i, "AB1  0A%d" % i, "AB1 0A%d" % i,
          198001 + i, "" if i < 4 else 202406, 0, 385386 + i, 801193 + i, 1,
          "E0000000%d" % i, "S99999999", "", "S12000033", "S13002843", "",
          "S92000003", "", "S14000001", "S22000047", "S30000026", "",
          "S0100%d" % i, "S0200%d" % i, "S34002990", "", "", "3", "1C3",
          57.101 + i * 0.001, -2.242 - i * 0.001, "", "", "S23000009",
          "" if i == 2 else 4691 + i, "S08000020"])
    with zipfile.ZipFile(os.path.join(OUT, "nspl.zip"), "w") as z:
        z.writestr("Data/NSPL21_AUG_2025_UK.csv", buf.getvalue())
        z.writestr("Data/multi_csv/NSPL21_AUG_2025_north.csv", buf.getvalue())
        z.writestr("User Guide/readme.txt", "docs\n")

# --------------------------------------------------- gpkg zip fixtures
def gp_line(pts, srs=27700):
    hdr = b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs)
    wkb = struct.pack("<BII", 1, 2, len(pts)) + b"".join(
      struct.pack("<2d", x, y) for x, y in pts)
    return hdr + wkb

def gp_poly(ring, srs=27700):
    hdr = b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs)
    wkb = struct.pack("<BIII", 1, 3, 1, len(ring)) + b"".join(
      struct.pack("<2d", x, y) for x, y in ring)
    return hdr + wkb

GPKG_META = """
    CREATE TABLE gpkg_contents (
      table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
      identifier TEXT UNIQUE, description TEXT DEFAULT '',
      last_change DATETIME NOT NULL DEFAULT '2025-07-01T00:00:00Z',
      min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER);
    CREATE TABLE gpkg_geometry_columns (
      table_name TEXT NOT NULL, column_name TEXT NOT NULL,
      geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
      z TINYINT NOT NULL, m TINYINT NOT NULL);
"""

def make_built_up_areas():
    tmp = os.path.join(OUT, "_bua.gpkg")
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    con.executescript(GPKG_META + """
        CREATE TABLE os_open_built_up_areas (
          fid INTEGER PRIMARY KEY, gsscode TEXT, name1_text TEXT,
          name1_language TEXT, name2_text TEXT, name2_language TEXT,
          areahectares REAL, geometry_area_m REAL, geom BLOB);
    """)
    con.execute("INSERT INTO gpkg_contents VALUES ('os_open_built_up_areas','features','os_open_built_up_areas','','2025-07-01T00:00:00Z',0,0,700000,1300000,27700)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('os_open_built_up_areas','geom','POLYGON',27700,0,0)")
    areas = [
      ("E63000001","Wembley","eng",None,None, 842.5, 8425000.0,
       [(519000.0,185000.0),(520000.0,185000.0),(520000.0,186000.0),(519000.0,185000.0)]),
      ("E63000002","Stratford","eng","Stratford2","eng", 120.0, 1200000.0,
       [(538000.0,184000.0),(538500.0,184000.0),(538500.0,184400.0),(538000.0,184000.0)]),
    ]
    for i, (gss, n1, l1, n2, l2, ha, am, ring) in enumerate(areas, 1):
        con.execute("INSERT INTO os_open_built_up_areas VALUES (?,?,?,?,?,?,?,?,?)",
          (i, gss, n1, l1, n2, l2, ha, am, gp_poly(ring)))
    con.commit(); con.close()
    with zipfile.ZipFile(os.path.join(OUT, "built_up_areas.zip"), "w") as z:
        z.write(tmp, "data/os_open_built_up_areas.gpkg")
    os.remove(tmp)

def make_os_open_usrn():
    tmp = os.path.join(OUT, "_usrn.gpkg")
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    con.executescript(GPKG_META + """
        CREATE TABLE openUSRN (
          fid INTEGER PRIMARY KEY, usrn INTEGER, street_type TEXT, geom BLOB);
    """)
    con.execute("INSERT INTO gpkg_contents VALUES ('openUSRN','features','openUSRN','','2025-07-01T00:00:00Z',0,0,700000,1300000,27700)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('openUSRN','geom','LINESTRING',27700,0,0)")
    streets = [
      (8401426, "Designated Street Name", [(501251.53,222574.64),(501305.92,222506.65)]),
      (8401427, "Officially Described Street", [(519250.0,185750.0),(519300.0,185800.0),(519350.0,185790.0)]),
      (8401428, "Numbered Street", [(529090.0,179645.0),(529100.0,179650.0)]),
    ]
    for i, (usrn, st, pts) in enumerate(streets, 1):
        con.execute("INSERT INTO openUSRN VALUES (?,?,?,?)",
          (i, usrn, st, gp_line(pts)))
    con.commit(); con.close()
    with zipfile.ZipFile(os.path.join(OUT, "os_open_usrn.zip"), "w") as z:
        z.write(tmp, "osopenusrn_202508.gpkg")
    os.remove(tmp)

# ----------------------------------------------- linked ids + directory
def make_os_usrn_uprn():
    buf = io.StringIO(); w = csv.writer(buf)
    w.writerow(["correlation_id","identifier_1","version_number_1",
      "version_date_1","identifier_2","version_number_2","version_date_2",
      "confidence"])
    for i in range(6):
        w.writerow(["uprn-usrn-%d" % i, 100090000000 + i, "1", 20240601,
          8401426 + (i % 3), "2", 20240601, "1"])
    with zipfile.ZipFile(os.path.join(OUT, "os_usrn_uprn.zip"), "w") as z:
        z.writestr("BLPU_UPRN_Street_USRN_11.csv", buf.getvalue())

def make_onsud():
    hdr = ["uprn","gridgb1e","gridgb1n","pcds","cty24cd","ced23cd","lad24cd",
      "wd24cd","parncp24cd","hlth19cd","ctry24cd","rgn24cd","pcon24cd",
      "eer20cd","ttwa15cd","itl25cd","npark16cd","oa21cd","lsoa21cd",
      "msoa21cd","wz11cd","sicbl24cd","bua24cd","buasd11cd","ruc21ind",
      "oac21ind","lep21cd1","lep21cd2","pfa23cd","imd19ind"]
    def region(start, n, rgn):
        buf = io.StringIO(); w = csv.writer(buf); w.writerow(hdr)
        for i in range(n):
            w.writerow([start + i, 519000 + i, 185000 + i, "HA9 6D%s" % "ABCDE"[i],
              "E10000002","","E09000005","E05013573","","E18000007","E92000001",
              rgn,"E14001081","E15000007","E30000234","TLI3","","E00000001",
              "E01000001","E02000001","E33000001","E38000256","E63000001","",
              "1","1A1","","","E23000001", 10000 + i])
        return buf.getvalue()
    with zipfile.ZipFile(os.path.join(OUT, "ons_uprn_directory.zip"), "w") as z:
        z.writestr("Data/ONSUD_AUG_2025_EE.csv", region(100090000000, 3, "E12000006"))
        z.writestr("Data/ONSUD_AUG_2025_LN.csv", region(100090000100, 2, "E12000007"))
        z.writestr("Documents/readme.txt", "docs\n")

# ------------------------------------------------- postcode estimates
def make_postcode_estimates():
    with open(os.path.join(OUT, "post_code_p001.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Postcode","Sex_Code","Sex_Label","Count"])
        for i, pc in enumerate(["HA9 6DE","SW1A 1AA","AB1 0AA"]):
            w.writerow([pc, 1, "Female", 120 + i * 10])
            w.writerow([pc, 2, "Male", 110 + i * 10])
        # the wellbeing-join postcode near the street_manager works
        w.writerow(["NW1 1AA", 1, "Female", 80])
        w.writerow(["NW1 1AA", 2, "Male", 70])
    with open(os.path.join(OUT, "post_code_p002.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Postcode","Count"])
        for i, pc in enumerate(["HA9 6DE","SW1A 1AA","AB1 0AA"]):
            w.writerow([pc, 95 + i * 5])
        w.writerow(["NW1 1AA", 50])

# ------------------------------------------------------ bduk hub + zips
BDUK_HEADER = ["uprn","struprn","bduk_recognised_premises","country","postcode",
  "lot_id","lot_name","subsidy_control_status","current_gigabit",
  "future_gigabit","local_authority_district_ons_code",
  "local_authority_district_ons","region_ons_code","region_ons","bduk_gis",
  "bduk_gis_contract_scope","bduk_gis_final_coverage_date",
  "bduk_gis_contract_name","bduk_gis_supplier","bduk_vouchers",
  "bduk_vouchers_contract_name","bduk_vouchers_supplier","bduk_superfast",
  "bduk_superfast_contract_name","bduk_superfast_supplier","bduk_hubs",
  "bduk_hubs_contract_name","bduk_hubs_supplier"]

def make_bduk():
    d = os.path.join(OUT, "bduk", "september-2025")
    os.makedirs(d, exist_ok=True)
    def region_csv(start, n, region, gig):
        buf = io.StringIO(); w = csv.writer(buf); w.writerow(BDUK_HEADER)
        for i in range(n):
            w.writerow([start + i, "S%d" % (start + i), "True", "England",
              "HA9 6D%s" % "ABCDE"[i], 14, "Lot 14", "White",
              "True" if (i + gig) % 2 == 0 else "False", "False",
              "E09000005", "Brent", "E12000007", region,
              "True", "In Scope", "2026-03-31", "Contract A", "Supplier X",
              "False", "", "", "True", "Superfast CT", "Supplier Y",
              "False", "", ""])
        return buf.getvalue()
    for name, start, n, region, gig in [
        ("bduk_east_region.zip", 200000000000, 3, "East of England", 0),
        ("bduk_west_midlands.zip", 200000000100, 2, "West Midlands", 1)]:
        with zipfile.ZipFile(os.path.join(d, name), "w") as z:
            z.writestr(name.replace(".zip", ".csv"),
                       region_csv(start, n, region, gig))
    with open(os.path.join(d, "hub.html"), "w") as f:
        f.write("""<html><body>
<section class="gem-c-attachment">
  <h3 class="gem-c-attachment__title">East of England</h3>
  <a href="bduk_east_region.zip">Download</a></section>
<section class="gem-c-attachment">
  <h3 class="gem-c-attachment__title">West Midlands</h3>
  <a href="bduk_west_midlands.zip">Download</a></section>
<a href="guidance.pdf">BDUK guidance (not a release)</a>
</body></html>""")

# ------------------------------------------------- section 58 (SCD2)
def s58_event(ref, event_ref, event_time, status, etype="SECTION_58_UPDATED",
              otype="SECTION_58", start="2025-01-01", end="2025-06-30"):
    return {
      "event_reference": event_ref, "event_type": etype,
      "event_time": event_time, "object_type": otype,
      "object_reference": ref, "version": 1,
      "object_data": {
        "section_58_reference_number": ref,
        "section_58_coordinates": "POINT(529090 179645)",
        "section_58_status": status,
        "start_date": "%sT00:00:00.000Z" % start,
        "end_date": "%sT00:00:00.000Z" % end,
        "section_58_duration": "6 months",
        "section_58_extent": "Full street",
        "section_58_location_type": "Carriageway",
        "status_change_date": event_time.replace("Z", "").replace("T", " "),
        "highway_authority_swa_code": "5990",
        "highway_authority": "CITY OF WESTMINSTER",
        "usrn": "8401426", "street_name": "Fake Street",
        "area_name": "LONDON", "town": "LONDON"}}

def make_section_58():
    m1 = [
      s58_event("S58-A", 1001, "2025-01-10T08:00:00.000Z", "proposed"),
      # two events for A in one load: rn must pick the newest
      s58_event("S58-A", 1002, "2025-01-20T09:00:00.000Z", "in force"),
      s58_event("S58-B", 1003, "2025-01-15T10:00:00.000Z", "in force"),
      # a PERMIT event in the same feed: the SECTION_58 filter must skip it
      s58_event("P-1", 1004, "2025-01-16T10:00:00.000Z", "granted",
                otype="PERMIT"),
    ]
    m2 = [
      # A: strictly newer event -> close v1, open v2
      s58_event("S58-A", 2001, "2025-02-05T08:00:00.000Z", "restriction lifted"),
      # B: REPLAYED January event (not newer) -> dim untouched
      s58_event("S58-B", 1003, "2025-01-15T10:00:00.000Z", "in force"),
      # C: brand new restriction
      s58_event("S58-C", 2002, "2025-02-10T12:00:00.000Z", "proposed"),
    ]
    for name, events in [("section_58_2025_01.zip", m1),
                         ("section_58_2025_02.zip", m2)]:
        with zipfile.ZipFile(os.path.join(OUT, name), "w") as z:
            for i, e in enumerate(events):
                z.writestr("event_%04d.json" % i, json.dumps(e, sort_keys=True))

make_street_manager(); make_nhs(); make_code_point(); make_bods(); make_naptan()
make_cadent(); make_dft(); make_nspl(); make_built_up_areas()
make_os_open_usrn(); make_os_usrn_uprn(); make_onsud()
make_postcode_estimates(); make_bduk(); make_section_58()
print("fixtures written to", OUT)
for f in sorted(os.listdir(OUT)):
    print(" ", f, os.path.getsize(os.path.join(OUT, f)), "bytes")
