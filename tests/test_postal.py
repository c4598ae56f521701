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


def test_reference_postal_corpus_classes():
    """Classes from the reference's postal fixture corpus
    (src/test/resources/data/postal-addresses.json AUS-01/02/03)."""
    from xponents_spark.gazetteer import geocode
    feats = ("places", "countries", "postal", "taxons")

    def by_label(text):
        return {m["label"]: m for m in geocode(text, features=feats)}

    # ADM1-qualified city + postal; year-like 1427/2021 admitted via NSW
    ms = by_label("Australia Post\n219-241 Cleveland St\nPaddington NSW  2021")
    assert ms["postal"]["matchtext"] == "2021"
    assert (ms["postal"]["cc"], ms["postal"]["adm1"]) == ("AU", "NSW")

    ms = by_label("Lighthouse Promotions PO Box 215 SPRINGVALE  VIC  3171 Australia")
    assert ms["postal"]["matchtext"] == "3171"
    assert ms["postal"]["adm1"] == "VIC"
    assert ms["place"]["adm1"] == "VIC"
    assert ms["country"]["cc"] == "AU"

    # table-formatted row (AUS-03): association survives the pipes
    ms = by_label("| 3A/45 Jindabyne Rd | Oakleigh |  VIC    | 3166 |")
    assert ms["postal"]["matchtext"] == "3166"
    assert ms["postal"]["adm1"] == "VIC"
