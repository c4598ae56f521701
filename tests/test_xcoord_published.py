"""Parity vs the reference's PUBLISHED XCoord pattern catalog.

Every example target in Table 1 of the reference's coordinate-extraction
doc (/root/reference/doc/XCoord.md:59-95 — one example per rule, true
positives only, DM-06 marked OBE/omitted) must extract a match of the same
family with the documented value.  Canonical values: most examples encode
42°18'00"N 102°24'00"W -> (42.3, -102.4); fractional variants shift in the
last field only, so they are asserted to 3 decimals of the base value.
"""

import pytest

from xponents_spark.extractors.xcoord import extract_coordinates

# (pattern family-id, example text, approx lat, approx lon, tolerance)
TABLE1 = [
    ("MGRS-01", "38SMB4611036560", 32.866, 44.424, 0.01),
    ("UTM-01", "17N 699990 3333335", 30.115, -78.924, 0.01),
    ("DMS-01fs", "01°44'55.5\"N 101°22'33.0\"E", 1.7488, 101.3758, 0.001),
    ("DMS-01fs", "N01°44'55.5\" E101°22'33.0\"", 1.7488, 101.3758, 0.001),
    ("DMS-01fs-deg", "01°44'55.5\" 101°22'33.0\"", 1.7488, 101.3758, 0.001),
    ("DMS-01dot", "01.44.55N 055.44.33E", 1.7486, 55.7425, 0.001),
    ("DMS-01dot", "N01.44.55 E055.44.33", 1.7486, 55.7425, 0.001),
    ("DMS-02", "N42 18' 00\" W102 24' 00\"", 42.3, -102.4, 0.001),
    ("DMS", "421800N 1022400W", 42.3, -102.4, 0.001),
    ("DMS", "N421800 W1022400", 42.3, -102.4, 0.001),
    ("DMS", "4218001234N 10224001234W", 42.3, -102.4, 0.001),
    ("DMS", "N4218001234 W10224001234", 42.3, -102.4, 0.001),
    ("DM-00", "4218N-009 10224W-003", 42.3, -102.4, 0.001),
    ("DM-01a", "42 18-009N 102 24-003W", 42.3, -102.4, 0.001),
    ("DM-01a", "42-18-009N; 102-24-003W", 42.3, -102.4, 0.001),
    ("DM-01a-dot", "42.18.009N 102.24.003W", 42.3, -102.4, 0.001),
    ("DM-01b", "N4218.009W10224.003", 42.3, -102.4, 0.001),
    ("DM-01b", "N42 18-005 x W102 24-008", 42.3, -102.4, 0.001),
    ("DM-01b-dot", "N42.18.005 x W102.24.008", 42.3, -102.4, 0.001),
    ("DM-02a", "4218.009N 10224.003W", 42.3, -102.4, 0.001),
    ("DM", "N4218.0 W10224.0", 42.3, -102.4, 0.001),
    ("DM-02b-dash", "N4218-0018 W10224-0444", 42.3, -102.4, 0.01),
    ("DM-03a", "4218009N10224003W", 42.3, -102.4, 0.001),
    ("DM-03b", "N4218009W10224003", 42.3, -102.4, 0.001),
    ("DM-03-av", "N42 18' W102 24'", 42.3, -102.4, 0.001),
    ("DM-03-av-deg", "42° 18' 102° 24'", 42.3, 102.4, 0.001),  # no hemi: unsigned
    ("DM-03-av-decdm", "42° 18.44' 102° 24.11'", 42.3073, 102.4018, 0.001),
    ("DM-03-bv", "42° 18'N 102° 24'W", 42.3, -102.4, 0.001),
    ("DM-04a", "N4218 W10224", 42.3, -102.4, 0.001),
    ("DM-04b", "4218N 10224W", 42.3, -102.4, 0.001),
    ("DM-05", "/4218N4/10224W5/", 42.3, -102.4, 0.001),
    ("DM-07", "42 DEG 18.0N 102 DEG 24.0W", 42.3, -102.4, 0.001),
    ("DM-08", "+42 18.0 x -102 24.0", 42.3, -102.4, 0.001),
    ("DD-01", "N42.3, W102.4", 42.3, -102.4, 0.001),
    ("DD-02", " 42.3N; 102.4W ", 42.3, -102.4, 0.001),
    ("DD-03", "+42.3°;-102.4°", 42.3, -102.4, 0.001),
    ("DD-04", "Latitude: N42.3° x Longitude: W102.3°", 42.3, -102.3, 0.001),
    ("DD-05", "N42°, W102°", 42.0, -102.0, 0.001),
    ("DD-06", "42° N, 102° W", 42.0, -102.0, 0.001),
    ("DD-07", "N42, W102", 42.0, -102.0, 0.001),
]


@pytest.mark.parametrize("pid,example,lat,lon,tol", TABLE1,
                         ids=[f"{t[0]}:{t[1][:24]}" for t in TABLE1])
def test_published_example(pid, example, lat, lon, tol):
    fam = pid.split("-")[0]
    ms = [m for m in extract_coordinates(example)
          if not m.filtered_out and m.pattern_id.startswith(fam)]
    assert ms, f"no {fam} match in {example!r}"
    m = ms[0]
    assert m.attrs["lat"] == pytest.approx(lat, abs=tol)
    assert m.attrs["lon"] == pytest.approx(lon, abs=tol)
