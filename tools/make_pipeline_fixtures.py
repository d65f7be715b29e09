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
        rows.append({
            "event_reference": 529770 + i,
            "event_type": "WORK_UPDATED" if i % 2 else "WORK_START",
            "event_time": f"2025-01-{10+i:02d}T08:0{i}:00.000Z",
            "object_type": "PERMIT",
            "object_reference": f"TSR1591199404915-{i:02d}",
            "version": 1 + i,
            "object_data": {
                "work_reference_number": f"TSR1591199404915",
                "work_category": ["Standard", "Minor", "Major"][i % 3],
                "work_status": "Works in progress",
                "activity_type": "Remedial works",
                "permit_reference_number": f"TSR1591199404915-{i:02d}",
                "permit_status": ["granted", "permit_modification_request"][i % 2],
                "promoter_swa_code": "STPR",
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
          ["route_id","service_id","trip_id","trip_headsign","direction_id","block_id","shape_id","wheelchair_accessible","trip_direction_name","vehicle_journey_code"],
          [["R1","SV1","T1","Station","0","","","1","outbound","VJ1"]]))
        z.writestr("stop_times.txt", txt(
          ["trip_id","arrival_time","departure_time","stop_id","stop_sequence","stop_headsign","pickup_type","drop_off_type","shape_dist_traveled","timepoint","stop_direction_name"],
          [["T1","08:00:00","08:00:00","S1","1","","0","0","","1",""],
           ["T1","08:07:00","08:07:00","S2","2","","0","0","","1",""]]))
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

make_street_manager(); make_nhs(); make_code_point(); make_bods(); make_naptan()
print("fixtures written to", OUT)
for f in sorted(os.listdir(OUT)):
    print(" ", f, os.path.getsize(os.path.join(OUT, f)), "bytes")
