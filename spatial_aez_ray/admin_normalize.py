"""Natural Earth ADMIN -> model country-name normalization.

The mapping table is parity-required DATA carried from the reference
(/root/reference/admin_names.py:4-77, itself sourced from the public
Natural Earth attribute table and the Drawdown model country list):
territories fold into their sovereign state, a handful of names are
respelled, and entries mapping to ``None`` are dropped from zonal
outputs (extract_country_data.py:223-225). Stored here sorted by key;
the *mechanism* (None-drop, many-to-one fold) is exercised by the
synthetic-world fixtures, and this table enables parity runs against
real Natural Earth shapefiles (sources.shapefile).
"""

from __future__ import annotations

ADMIN_MAP: dict[str, str | None] = {
    "Akrotiri Sovereign Base Area": "United Kingdom",
    "Aland": "Finland",
    "American Samoa": "United States of America",
    "Anguilla": "United Kingdom",
    "Aruba": "Netherlands",
    "Ashmore and Cartier Islands": "Australia",
    "Bajo Nuevo Bank (Petrel Is.)": None,
    "Baykonur Cosmodrome": "Kazakhstan",
    "Bermuda": "United Kingdom",
    "British Indian Ocean Territory": "United Kingdom",
    "British Virgin Islands": "United Kingdom",
    "Cabo Verde": "Cape Verde",
    "Cayman Islands": "United Kingdom",
    "Clipperton Island": "France",
    "Coral Sea Islands": "Australia",
    "Cyprus No Mans Area": "Cyprus",
    "Czechia": "Czech Republic",
    "Dhekelia Sovereign Base Area": "United Kingdom",
    "East Timor": "Timor-Leste",
    "Falkland Islands": None,
    "Federated States of Micronesia": "Micronesia (Federated States of)",
    "French Polynesia": "France",
    "French Southern and Antarctic Lands": "France",
    "Gibraltar": "United Kingdom",
    "Guam": "United States of America",
    "Guernsey": "United Kingdom",
    "Heard Island and McDonald Islands": "Australia",
    "Hong Kong S.A.R.": "Hong Kong",
    "Indian Ocean Territories": None,
    "Isle of Man": None,
    "Ivory Coast": "Côte d'Ivoire",
    "Jersey": "United Kingdom",
    "Kosovo": None,
    "Laos": "Lao People's Democratic Republic",
    "Macao S.A.R": None,
    "Macedonia": "The former Yugoslav Republic of Macedonia",
    "Montserrat": "United Kingdom",
    "New Caledonia": "France",
    "Norfolk Island": "Australia",
    "North Korea": "Democratic People's Republic of Korea",
    "Northern Cyprus": "Cyprus",
    "Northern Mariana Islands": "United States of America",
    "Pitcairn Islands": "United Kingdom",
    "Puerto Rico": "United States of America",
    "Republic of Serbia": "Serbia",
    "Republic of the Congo": "Congo",
    "Russia": "Russian Federation",
    "Saint Barthelemy": "France",
    "Saint Helena": "United Kingdom",
    "Saint Martin": None,
    "Saint Pierre and Miquelon": "France",
    "Scarborough Reef": None,
    "Serranilla Bank": None,
    "Siachen Glacier": None,
    "Sint Maarten": None,
    "Somaliland": "Somalia",
    "South Georgia and the Islands": "United Kingdom",
    "South Korea": "Republic of Korea (South Korea)",
    "Spratly Islands": None,
    "Syria": "Syrian Arab Republic",
    "The Bahamas": "Bahamas",
    "Turks and Caicos Islands": "United Kingdom",
    "US Naval Base Guantanamo Bay": "United States of America",
    "United States Minor Outlying Islands": "United States of America",
    "United States Virgin Islands": "United States of America",
    "Vatican": "Holy See",
    "Wallis and Futuna": "France",
    "eSwatini": "Swaziland",
}


def normalize(admin: str) -> str | None:
    """Natural Earth ADMIN -> model name; unmapped names pass through
    unchanged, ``None`` means the feature is dropped."""
    return ADMIN_MAP.get(admin, admin)
