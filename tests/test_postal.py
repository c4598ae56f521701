"""Postal geocoding — fixtures shaped like the reference's
src/test/resources/data/postal-addresses.json AUS-01 cases."""

from xponents_spark.gazetteer import geocode


def postals(text):
    return [m for m in geocode(text) if m["label"] == "postal"]


def test_adm1_qualified_postal():
    ms = postals("Australia Post, 219-241 Cleveland St, Paddington NSW 2021")
    assert len(ms) == 1
    m = ms[0]
    assert (m["cc"], m["adm1"], m["matchtext"]) == ("AU", "NSW", "2021")
    assert m["confidence"] >= 70


def test_year_like_code_requires_admin():
    assert not postals("the year 2021 was wild")
    assert postals("Banksmeadow NSW 2019")


def test_postal_without_geography_dropped():
    assert not postals("visit 10115 sometime")


def test_country_scope_admits_postal():
    ms = postals("Berlin 10115, Germany")
    assert ms and ms[0]["cc"] == "DE"


def test_uk_two_part_code():
    ms = postals("London SW1A 1AA, UK")
    assert ms and ms[0]["matchtext"] == "SW1A 1AA"


def test_zip_with_qualified_city():
    ms = postals("San Diego, CA 92101")
    assert ms and ms[0]["place_id"] == "US.92101"
