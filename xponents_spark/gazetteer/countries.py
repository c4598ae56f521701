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

# Remainder of ISO 3166-1: (iso2, iso3, fips, name, aliases, utc_offsets).
# Public-knowledge data in the geonames countryInfo shape the reference
# loads (SolrGazetteer.java:209-245); FIPS 10-4 codes given where they are
# standard (note the famous ISO/FIPS divergences: CH->SZ, ZA->SF, SE->SW,
# SG->SN, ...); ambiguous/absent FIPS left "" and never registered.
_REST: tuple[tuple, ...] = (
    ("AD", "AND", "AN", "Andorra", (), (1.0,)),
    ("AE", "ARE", "AE", "United Arab Emirates", ("UAE",), (4.0,)),
    ("AF", "AFG", "AF", "Afghanistan", (), (4.5,)),
    ("AG", "ATG", "AC", "Antigua and Barbuda", ("Antigua",), (-4.0,)),
    ("AI", "AIA", "AV", "Anguilla", (), (-4.0,)),
    ("AL", "ALB", "AL", "Albania", (), (1.0,)),
    ("AM", "ARM", "AM", "Armenia", (), (4.0,)),
    ("AO", "AGO", "AO", "Angola", (), (1.0,)),
    ("AQ", "ATA", "AY", "Antarctica", (), ()),
    ("AS", "ASM", "AQ", "American Samoa", (), (-11.0,)),
    ("AT", "AUT", "AU", "Austria", ("Österreich",), (1.0,)),
    ("AW", "ABW", "AA", "Aruba", (), (-4.0,)),
    ("AX", "ALA", "", "Åland Islands", ("Aland Islands",), (2.0,)),
    ("AZ", "AZE", "AJ", "Azerbaijan", (), (4.0,)),
    ("BA", "BIH", "BK", "Bosnia and Herzegovina", ("Bosnia",), (1.0,)),
    ("BB", "BRB", "BB", "Barbados", (), (-4.0,)),
    ("BD", "BGD", "BG", "Bangladesh", (), (6.0,)),
    ("BE", "BEL", "BE", "Belgium", ("Belgique",), (1.0,)),
    ("BF", "BFA", "UV", "Burkina Faso", (), (0.0,)),
    ("BG", "BGR", "BU", "Bulgaria", (), (2.0,)),
    ("BH", "BHR", "BA", "Bahrain", (), (3.0,)),
    ("BI", "BDI", "BY", "Burundi", (), (2.0,)),
    ("BJ", "BEN", "BN", "Benin", (), (1.0,)),
    ("BL", "BLM", "TB", "Saint Barthélemy", ("Saint Barthelemy",), (-4.0,)),
    ("BM", "BMU", "BD", "Bermuda", (), (-4.0,)),
    ("BN", "BRN", "BX", "Brunei", ("Brunei Darussalam",), (8.0,)),
    ("BO", "BOL", "BL", "Bolivia", (), (-4.0,)),
    ("BQ", "BES", "", "Bonaire, Sint Eustatius and Saba", ("Bonaire",),
     (-4.0,)),
    ("BS", "BHS", "BF", "Bahamas", ("The Bahamas",), (-5.0,)),
    ("BT", "BTN", "BT", "Bhutan", (), (6.0,)),
    ("BV", "BVT", "BV", "Bouvet Island", (), ()),
    ("BW", "BWA", "BC", "Botswana", (), (2.0,)),
    ("BY", "BLR", "BO", "Belarus", ("Belorussia",), (3.0,)),
    ("BZ", "BLZ", "BH", "Belize", (), (-6.0,)),
    ("CC", "CCK", "CK", "Cocos Islands", ("Keeling Islands",), (6.5,)),
    ("CD", "COD", "CG", "Democratic Republic of the Congo",
     ("DR Congo", "DRC", "Congo-Kinshasa", "Zaire"), (1.0, 2.0)),
    ("CF", "CAF", "CT", "Central African Republic", ("CAR",), (1.0,)),
    ("CG", "COG", "CF", "Republic of the Congo",
     ("Congo", "Congo-Brazzaville"), (1.0,)),
    ("CH", "CHE", "SZ", "Switzerland", ("Suisse", "Schweiz"), (1.0,)),
    ("CI", "CIV", "IV", "Ivory Coast", ("Côte d'Ivoire", "Cote d'Ivoire"),
     (0.0,)),
    ("CK", "COK", "CW", "Cook Islands", (), (-10.0,)),
    ("CL", "CHL", "CI", "Chile", (), (-4.0,)),
    ("CM", "CMR", "CM", "Cameroon", (), (1.0,)),
    ("CO", "COL", "CO", "Colombia", (), (-5.0,)),
    ("CR", "CRI", "CS", "Costa Rica", (), (-6.0,)),
    ("CU", "CUB", "CU", "Cuba", (), (-5.0,)),
    ("CV", "CPV", "CV", "Cabo Verde", ("Cape Verde",), (-1.0,)),
    ("CW", "CUW", "UC", "Curaçao", ("Curacao",), (-4.0,)),
    ("CX", "CXR", "KT", "Christmas Island", (), (7.0,)),
    ("CY", "CYP", "CY", "Cyprus", (), (2.0,)),
    ("CZ", "CZE", "EZ", "Czechia", ("Czech Republic",), (1.0,)),
    ("DJ", "DJI", "DJ", "Djibouti", (), (3.0,)),
    ("DK", "DNK", "DA", "Denmark", ("Danmark",), (1.0,),
     ("Faroe Islands", "Greenland")),
    ("DM", "DMA", "DO", "Dominica", (), (-4.0,)),
    ("DO", "DOM", "DR", "Dominican Republic", (), (-4.0,)),
    ("DZ", "DZA", "AG", "Algeria", (), (1.0,)),
    ("EC", "ECU", "EC", "Ecuador", (), (-5.0,)),
    ("EE", "EST", "EN", "Estonia", (), (2.0,)),
    ("EG", "EGY", "EG", "Egypt", (), (2.0,)),
    ("EH", "ESH", "WI", "Western Sahara", (), (1.0,)),
    ("ER", "ERI", "ER", "Eritrea", (), (3.0,)),
    ("ET", "ETH", "ET", "Ethiopia", (), (3.0,)),
    ("FI", "FIN", "FI", "Finland", ("Suomi",), (2.0,)),
    ("FJ", "FJI", "FJ", "Fiji", (), (12.0,)),
    ("FK", "FLK", "FK", "Falkland Islands", ("Malvinas",), (-3.0,)),
    ("FM", "FSM", "FM", "Micronesia",
     ("Federated States of Micronesia",), (10.0, 11.0)),
    ("FO", "FRO", "FO", "Faroe Islands", ("Faeroe Islands",), (0.0,)),
    ("GA", "GAB", "GB", "Gabon", (), (1.0,)),
    ("GD", "GRD", "GJ", "Grenada", (), (-4.0,)),
    ("GE", "GEO", "GG", "Georgia", (), (4.0,)),
    ("GF", "GUF", "FG", "French Guiana", (), (-3.0,)),
    ("GG", "GGY", "GK", "Guernsey", (), (0.0,)),
    ("GH", "GHA", "GH", "Ghana", (), (0.0,)),
    ("GI", "GIB", "GI", "Gibraltar", (), (1.0,)),
    ("GL", "GRL", "GL", "Greenland", ("Kalaallit Nunaat",), (-3.0,)),
    ("GM", "GMB", "GA", "Gambia", ("The Gambia",), (0.0,)),
    ("GN", "GIN", "GV", "Guinea", (), (0.0,)),
    ("GP", "GLP", "GP", "Guadeloupe", (), (-4.0,)),
    ("GQ", "GNQ", "EK", "Equatorial Guinea", (), (1.0,)),
    ("GR", "GRC", "GR", "Greece", ("Hellas",), (2.0,)),
    ("GS", "SGS", "SX", "South Georgia and the South Sandwich Islands",
     ("South Georgia",), (-2.0,)),
    ("GT", "GTM", "GT", "Guatemala", (), (-6.0,)),
    ("GU", "GUM", "GQ", "Guam", (), (10.0,)),
    ("GW", "GNB", "PU", "Guinea-Bissau", (), (0.0,)),
    ("GY", "GUY", "GY", "Guyana", (), (-4.0,)),
    ("HK", "HKG", "HK", "Hong Kong", (), (8.0,)),
    ("HM", "HMD", "HM", "Heard Island and McDonald Islands", (), (5.0,)),
    ("HN", "HND", "HO", "Honduras", (), (-6.0,)),
    ("HR", "HRV", "HR", "Croatia", ("Hrvatska",), (1.0,)),
    ("HT", "HTI", "HA", "Haiti", (), (-5.0,)),
    ("HU", "HUN", "HU", "Hungary", ("Magyarország",), (1.0,)),
    ("ID", "IDN", "ID", "Indonesia", (), (7.0, 8.0, 9.0)),
    ("IL", "ISR", "IS", "Israel", (), (2.0,)),
    ("IM", "IMN", "IM", "Isle of Man", (), (0.0,)),
    ("IO", "IOT", "IO", "British Indian Ocean Territory",
     ("Chagos Islands",), (6.0,)),
    ("IS", "ISL", "IC", "Iceland", ("Ísland",), (0.0,)),
    ("JE", "JEY", "JE", "Jersey", (), (0.0,)),
    ("JM", "JAM", "JM", "Jamaica", (), (-5.0,)),
    ("JO", "JOR", "JO", "Jordan", (), (2.0,)),
    ("KE", "KEN", "KE", "Kenya", (), (3.0,)),
    ("KG", "KGZ", "KG", "Kyrgyzstan", ("Kirghizia",), (6.0,)),
    ("KH", "KHM", "CB", "Cambodia", ("Kampuchea",), (7.0,)),
    ("KI", "KIR", "KR", "Kiribati", (), (12.0, 13.0, 14.0)),
    ("KM", "COM", "CN", "Comoros", (), (3.0,)),
    ("KN", "KNA", "SC", "Saint Kitts and Nevis", ("Saint Kitts",), (-4.0,)),
    ("KW", "KWT", "KU", "Kuwait", (), (3.0,)),
    ("KY", "CYM", "CJ", "Cayman Islands", (), (-5.0,)),
    ("KZ", "KAZ", "KZ", "Kazakhstan", (), (5.0, 6.0)),
    ("LA", "LAO", "LA", "Laos", ("Lao People's Democratic Republic",),
     (7.0,)),
    ("LB", "LBN", "LE", "Lebanon", (), (2.0,)),
    ("LC", "LCA", "ST", "Saint Lucia", (), (-4.0,)),
    ("LI", "LIE", "LS", "Liechtenstein", (), (1.0,)),
    ("LK", "LKA", "CE", "Sri Lanka", ("Ceylon",), (5.5,)),
    ("LR", "LBR", "LI", "Liberia", (), (0.0,)),
    ("LS", "LSO", "LT", "Lesotho", (), (2.0,)),
    ("LT", "LTU", "LH", "Lithuania", (), (2.0,)),
    ("LU", "LUX", "LU", "Luxembourg", (), (1.0,)),
    ("LV", "LVA", "LG", "Latvia", (), (2.0,)),
    ("LY", "LBY", "LY", "Libya", (), (2.0,)),
    ("MA", "MAR", "MO", "Morocco", ("Maroc",), (1.0,)),
    ("MC", "MCO", "MN", "Monaco", (), (1.0,)),
    ("MD", "MDA", "MD", "Moldova", ("Republic of Moldova",), (2.0,)),
    ("ME", "MNE", "MJ", "Montenegro", ("Crna Gora",), (1.0,)),
    ("MF", "MAF", "RN", "Saint Martin", (), (-4.0,)),
    ("MG", "MDG", "MA", "Madagascar", (), (3.0,)),
    ("MH", "MHL", "RM", "Marshall Islands", (), (12.0,)),
    ("MK", "MKD", "MK", "North Macedonia", ("Macedonia",), (1.0,)),
    ("ML", "MLI", "ML", "Mali", (), (0.0,)),
    ("MM", "MMR", "BM", "Myanmar", ("Burma",), (6.5,)),
    ("MN", "MNG", "MG", "Mongolia", (), (8.0,)),
    ("MO", "MAC", "MC", "Macau", ("Macao",), (8.0,)),
    ("MP", "MNP", "CQ", "Northern Mariana Islands", ("Saipan",), (10.0,)),
    ("MQ", "MTQ", "MB", "Martinique", (), (-4.0,)),
    ("MR", "MRT", "MR", "Mauritania", (), (0.0,)),
    ("MS", "MSR", "MH", "Montserrat", (), (-4.0,)),
    ("MT", "MLT", "MT", "Malta", (), (1.0,)),
    ("MU", "MUS", "MP", "Mauritius", (), (4.0,)),
    ("MV", "MDV", "MV", "Maldives", (), (5.0,)),
    ("MW", "MWI", "MI", "Malawi", (), (2.0,)),
    ("MY", "MYS", "MY", "Malaysia", (), (8.0,)),
    ("MZ", "MOZ", "MZ", "Mozambique", ("Moçambique",), (2.0,)),
    ("NA", "NAM", "WA", "Namibia", (), (2.0,)),
    ("NC", "NCL", "NC", "New Caledonia", ("Nouvelle-Calédonie",), (11.0,)),
    ("NE", "NER", "NG", "Niger", (), (1.0,)),
    ("NF", "NFK", "NF", "Norfolk Island", (), (11.0,)),
    ("NG", "NGA", "NI", "Nigeria", (), (1.0,)),
    ("NI", "NIC", "NU", "Nicaragua", (), (-6.0,)),
    ("NL", "NLD", "NL", "Netherlands", ("Holland", "The Netherlands"),
     (1.0,), ("Aruba", "Curaçao", "Sint Maarten")),
    ("NO", "NOR", "NO", "Norway", ("Norge",), (1.0,),
     ("Svalbard", "Jan Mayen")),
    ("NP", "NPL", "NP", "Nepal", (), (5.75,)),
    ("NR", "NRU", "NR", "Nauru", (), (12.0,)),
    ("NU", "NIU", "NE", "Niue", (), (-11.0,)),
    ("OM", "OMN", "MU", "Oman", (), (4.0,)),
    ("PA", "PAN", "PM", "Panama", (), (-5.0,)),
    ("PE", "PER", "PE", "Peru", ("Perú",), (-5.0,)),
    ("PF", "PYF", "FP", "French Polynesia", ("Tahiti",), (-10.0,)),
    ("PG", "PNG", "PP", "Papua New Guinea", ("PNG",), (10.0,)),
    ("PH", "PHL", "RP", "Philippines", ("The Philippines",), (8.0,)),
    ("PK", "PAK", "PK", "Pakistan", (), (5.0,)),
    ("PL", "POL", "PL", "Poland", ("Polska",), (1.0,)),
    ("PM", "SPM", "SB", "Saint Pierre and Miquelon", (), (-3.0,)),
    ("PN", "PCN", "PC", "Pitcairn", ("Pitcairn Islands",), (-8.0,)),
    ("PR", "PRI", "RQ", "Puerto Rico", (), (-4.0,)),
    ("PS", "PSE", "WE", "Palestine", ("Palestinian Territory", "West Bank",
                                      "Gaza"), (2.0,)),
    ("PW", "PLW", "PS", "Palau", (), (9.0,)),
    ("PY", "PRY", "PA", "Paraguay", (), (-4.0,)),
    ("QA", "QAT", "QA", "Qatar", (), (3.0,)),
    ("RE", "REU", "RE", "Réunion", ("Reunion",), (4.0,)),
    ("RO", "ROU", "RO", "Romania", ("România",), (2.0,)),
    ("RS", "SRB", "RI", "Serbia", ("Srbija",), (1.0,)),
    ("RW", "RWA", "RW", "Rwanda", (), (2.0,)),
    ("SA", "SAU", "SA", "Saudi Arabia", ("KSA",), (3.0,)),
    ("SB", "SLB", "BP", "Solomon Islands", (), (11.0,)),
    ("SC", "SYC", "SE", "Seychelles", (), (4.0,)),
    ("SD", "SDN", "SU", "Sudan", (), (2.0,)),
    ("SE", "SWE", "SW", "Sweden", ("Sverige",), (1.0,)),
    ("SG", "SGP", "SN", "Singapore", (), (8.0,)),
    ("SH", "SHN", "SH", "Saint Helena",
     ("Saint Helena, Ascension and Tristan da Cunha",), (0.0,)),
    ("SI", "SVN", "SI", "Slovenia", ("Slovenija",), (1.0,)),
    ("SJ", "SJM", "SV", "Svalbard and Jan Mayen", ("Svalbard",), (1.0,)),
    ("SK", "SVK", "LO", "Slovakia", ("Slovensko",), (1.0,)),
    ("SL", "SLE", "SL", "Sierra Leone", (), (0.0,)),
    ("SM", "SMR", "SM", "San Marino", (), (1.0,)),
    ("SN", "SEN", "SG", "Senegal", ("Sénégal",), (0.0,)),
    ("SO", "SOM", "SO", "Somalia", (), (3.0,)),
    ("SR", "SUR", "NS", "Suriname", (), (-3.0,)),
    ("SS", "SSD", "OD", "South Sudan", (), (2.0,)),
    ("ST", "STP", "TP", "São Tomé and Príncipe",
     ("Sao Tome and Principe", "Sao Tome"), (0.0,)),
    ("SV", "SLV", "ES", "El Salvador", (), (-6.0,)),
    ("SX", "SXM", "NN", "Sint Maarten", (), (-4.0,)),
    ("SY", "SYR", "SY", "Syria", ("Syrian Arab Republic",), (2.0,)),
    ("SZ", "SWZ", "WZ", "Eswatini", ("Swaziland",), (2.0,)),
    ("TC", "TCA", "TK", "Turks and Caicos Islands", ("Turks and Caicos",),
     (-5.0,)),
    ("TD", "TCD", "CD", "Chad", ("Tchad",), (1.0,)),
    ("TF", "ATF", "FS", "French Southern Territories",
     ("Kerguelen",), (5.0,)),
    ("TG", "TGO", "TO", "Togo", (), (0.0,)),
    ("TH", "THA", "TH", "Thailand", ("Siam",), (7.0,)),
    ("TJ", "TJK", "TI", "Tajikistan", (), (5.0,)),
    ("TK", "TKL", "TL", "Tokelau", (), (13.0,)),
    ("TL", "TLS", "TT", "Timor-Leste", ("East Timor",), (9.0,)),
    ("TM", "TKM", "TX", "Turkmenistan", (), (5.0,)),
    ("TN", "TUN", "TS", "Tunisia", ("Tunisie",), (1.0,)),
    ("TO", "TON", "TN", "Tonga", (), (13.0,)),
    ("TR", "TUR", "TU", "Turkey", ("Türkiye", "Turkiye"), (3.0,)),
    ("TT", "TTO", "TD", "Trinidad and Tobago", ("Trinidad",), (-4.0,)),
    ("TV", "TUV", "TV", "Tuvalu", (), (12.0,)),
    ("TW", "TWN", "TW", "Taiwan", ("Republic of China", "Formosa"), (8.0,)),
    ("TZ", "TZA", "TZ", "Tanzania", ("United Republic of Tanzania",),
     (3.0,)),
    ("UA", "UKR", "UP", "Ukraine", ("Ukraina",), (2.0,)),
    ("UG", "UGA", "UG", "Uganda", (), (3.0,)),
    ("UM", "UMI", "", "United States Minor Outlying Islands",
     ("Wake Island", "Midway Islands"), (-11.0,)),
    ("UY", "URY", "UY", "Uruguay", (), (-3.0,)),
    ("UZ", "UZB", "UZ", "Uzbekistan", (), (5.0,)),
    ("VA", "VAT", "VT", "Vatican City", ("Holy See", "Vatican"), (1.0,)),
    ("VC", "VCT", "VC", "Saint Vincent and the Grenadines",
     ("Saint Vincent",), (-4.0,)),
    ("VE", "VEN", "VE", "Venezuela", (), (-4.0,)),
    ("VG", "VGB", "VI", "British Virgin Islands", ("BVI",), (-4.0,)),
    ("VI", "VIR", "VQ", "U.S. Virgin Islands", ("US Virgin Islands",),
     (-4.0,)),
    ("VN", "VNM", "VM", "Vietnam", ("Viet Nam",), (7.0,)),
    ("VU", "VUT", "NH", "Vanuatu", ("New Hebrides",), (11.0,)),
    ("WF", "WLF", "WF", "Wallis and Futuna", (), (12.0,)),
    ("WS", "WSM", "WS", "Samoa", ("Western Samoa",), (13.0,)),
    ("YE", "YEM", "YM", "Yemen", (), (3.0,)),
    ("YT", "MYT", "MF", "Mayotte", (), (3.0,)),
    ("ZA", "ZAF", "SF", "South Africa", ("RSA",), (2.0,)),
    ("ZM", "ZMB", "ZA", "Zambia", (), (2.0,)),
    ("ZW", "ZWE", "ZI", "Zimbabwe", ("Rhodesia",), (2.0,)),
)

_CATALOG.extend(Country(*row) for row in _REST)

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
