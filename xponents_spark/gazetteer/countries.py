"""Country catalog: ISO2/ISO3/FIPS keys, aliases, territories, timezones.

Mirrors the reference's GeonamesUtility/SolrGazetteer country loading
(``SolrGazetteer.java:209-245,269-280``; GeonamesUtility.html: "Countries
have names, codes, regions, aliases, timezones"; territories that carry
another nation's code attach to that country).  The reference hydrates this
from geonames.org flat files at startup; here it is an embedded
deterministic catalog covering the engine's gazetteer countries — the shape
and lookup API are the contract, rows extend without code changes.

In Spark jobs this is executor-side constant data (closure/broadcast class),
like every other side table in this package.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Country:
    iso2: str
    iso3: str
    fips: str
    name: str
    aliases: tuple[str, ...] = ()
    # primary UTC offsets in hours (a spanning country lists several)
    utc_offsets: tuple[float, ...] = ()
    # territory names that carry THIS country's code (GeonamesUtility:
    # "Territories that carry another nation's country code are attached
    # to that country")
    territories: tuple[str, ...] = ()


_CATALOG: list[Country] = [
    Country("US", "USA", "US", "United States",
            ("USA", "U.S.", "U.S.A.", "America", "United States of America"),
            (-5.0, -6.0, -7.0, -8.0, -9.0, -10.0),
            ("Puerto Rico", "Guam", "American Samoa",
             "U.S. Virgin Islands", "Northern Mariana Islands")),
    Country("GB", "GBR", "UK", "United Kingdom",
            ("UK", "Britain", "Great Britain"),
            (0.0,),
            ("Gibraltar", "Bermuda", "Falkland Islands", "Cayman Islands")),
    Country("FR", "FRA", "FR", "France", ("French Republic",),
            (1.0,), ("French Guiana", "Martinique", "Guadeloupe",
                     "Reunion", "New Caledonia")),
    Country("DE", "DEU", "GM", "Germany", ("Deutschland",), (1.0,)),
    Country("ES", "ESP", "SP", "Spain", ("España",), (1.0,)),
    Country("IT", "ITA", "IT", "Italy", ("Italia",), (1.0,)),
    Country("RU", "RUS", "RS", "Russia", ("Russian Federation",),
            (3.0, 5.0, 7.0, 9.0, 12.0)),
    Country("CN", "CHN", "CH", "China", ("People's Republic of China", "PRC"),
            (8.0,), ("Hong Kong", "Macau")),
    Country("JP", "JPN", "JA", "Japan", ("Nippon",), (9.0,)),
    Country("IN", "IND", "IN", "India", (), (5.5,)),
    Country("BR", "BRA", "BR", "Brazil", ("Brasil",), (-3.0, -4.0)),
    Country("CA", "CAN", "CA", "Canada", (), (-3.5, -4.0, -5.0, -6.0, -7.0, -8.0)),
    Country("AU", "AUS", "AS", "Australia", (),
            (8.0, 9.5, 10.0), ("Norfolk Island", "Christmas Island")),
    Country("MX", "MEX", "MX", "Mexico", ("México",), (-6.0, -7.0)),
    Country("AR", "ARG", "AR", "Argentina", (), (-3.0,)),
    Country("IQ", "IRQ", "IZ", "Iraq", (), (3.0,)),
    Country("IR", "IRN", "IR", "Iran", ("Islamic Republic of Iran",), (3.5,)),
    Country("IE", "IRL", "EI", "Ireland", ("Eire",), (0.0,)),
    Country("PT", "PRT", "PO", "Portugal", (), (0.0, -1.0)),
    Country("NZ", "NZL", "NZ", "New Zealand", (), (12.0,), ("Tokelau",)),
    Country("KP", "PRK", "KN", "North Korea",
            ("DPRK", "Democratic People's Republic of Korea"), (9.0,)),
    Country("KR", "KOR", "KS", "South Korea", ("Republic of Korea",), (9.0,)),
]

_BY_CODE: dict[str, Country] = {}
for _c in _CATALOG:
    for k in (_c.iso2, _c.iso3):
        _BY_CODE[k] = _c
    # FIPS keys only where they don't collide with an ISO2 of another
    # country ("ambiguous codes will not do anything" — GeonamesUtility
    # getCountryByAnyCode)
    _BY_CODE.setdefault(_c.fips, _c)

_BY_NAME: dict[str, Country] = {}
for _c in _CATALOG:
    _BY_NAME[_c.name.lower()] = _c
    for a in _c.aliases:
        _BY_NAME[a.lower()] = _c
    for t in _c.territories:
        _BY_NAME.setdefault(t.lower(), _c)


def get_country(code_or_name: str) -> Country | None:
    """GeonamesUtility.getCountryByAnyCode + name/alias/territory lookup."""
    if not code_or_name:
        return None
    c = _BY_CODE.get(code_or_name.upper())
    if c:
        return c
    return _BY_NAME.get(code_or_name.lower())


def countries_in_utc_offset(utc: float) -> list[str]:
    """ISO2 codes of countries observing the given UTC offset
    (GeonamesUtility.countriesInUTCOffset)."""
    return sorted(c.iso2 for c in _CATALOG if utc in c.utc_offsets)


def approximate_longitude_for_utc_offset(utc: int) -> int:
    """+/-5-degree longitude band center for a UTC offset
    (GeonamesUtility.approximateLongitudeForUTCOffset): 15° per hour."""
    return max(-180, min(180, int(utc) * 15))
