"""Convertible measurement units.

Behavioral port of the reference's unit system (SJ/units/UnitManager.java:162-254,
SJ/parsers/UnitParser.java:17-27; data files SearchJoins/Units/Convertible/*.txt):
a unit family has a base (main) unit and subunits, each with abbreviations and
a rate-to-base.  ``parse_unit(text)``:

1. negative sign removed and re-applied at the end;
2. numeric part extracted with ``([\\d.,]+)`` and ','→'.' (European decimals:
   "3,5 km" → 3.5);
3. the residue (text minus the number, trimmed, lowercased) must exactly equal
   one abbreviation or the subunit name — longest-abbreviation preference is
   subsumed by the exact-residue dict lookup;
4. converted value = number × rate_to_convert (in base-unit terms).

The unit tables below are our own data (public conversion factors), covering
the same families as the reference's 21 data files at reduced breadth.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class SubUnit:
    name: str
    family: str          # unit family (main-unit) name
    base_name: str       # base unit name within the family
    rate: float          # (value + offset) × rate = value in base unit
    abbreviations: tuple[str, ...]
    offset: float = 0.0  # pre-scale shift (temperature scales); 0 elsewhere


# family -> base unit name -> [(subunit name, rate, abbreviations...)]
_UNIT_TABLES: dict[str, tuple[str, list[tuple[str, float, tuple[str, ...]]]]] = {
    "Area": ("squareMetre", [
        ("squareMetre", 1.0, ("m2", "m²", "square metre", "squaremetre", "sqm", "sq.m.")),
        ("squareMillimetre", 1.0e-6, ("mm2", "mm²", "squaremillimetre")),
        ("squareCentimetre", 1.0e-4, ("cm2", "cm²", "squarecentimetre")),
        ("squareKilometre", 1.0e6, ("km2", "km²", "sqkm", "sq.km.", "squarekilometre", "square kilometre", "square km")),
        ("hectare", 1.0e4, ("ha", "hectare", "hectares")),
        ("acre", 4046.8564224, ("acre", "acres")),
        ("squareMile", 2589988.110336, ("sqmi", "sq.mi.", "square mile", "mi2", "mi²")),
        ("squareFoot", 0.09290304, ("sqft", "sq.ft.", "ft2", "ft²", "square foot")),
    ]),
    "Length": ("metre", [
        ("metre", 1.0, ("m", "metre", "meter", "metres", "meters")),
        ("millimetre", 1.0e-3, ("mm", "millimetre", "millimeter")),
        ("centimetre", 1.0e-2, ("cm", "centimetre", "centimeter")),
        ("kilometre", 1.0e3, ("km", "kilometre", "kilometer", "kilometres", "kilometers")),
        ("inch", 0.0254, ("in", "inch", "inches", '"')),
        ("foot", 0.3048, ("ft", "foot", "feet")),
        ("yard", 0.9144, ("yd", "yard", "yards")),
        ("mile", 1609.344, ("mi", "mile", "miles")),
    ]),
    "Mass": ("kilogram", [
        ("kilogram", 1.0, ("kg", "kilogram", "kilograms", "kgs")),
        ("gram", 1.0e-3, ("g", "gram", "grams")),
        ("milligram", 1.0e-6, ("mg", "milligram", "milligrams")),
        ("tonne", 1.0e3, ("t", "tonne", "tonnes", "ton", "tons")),
        ("pound", 0.45359237, ("lb", "lbs", "pound", "pounds")),
        ("ounce", 0.028349523125, ("oz", "ounce", "ounces")),
    ]),
    "Time": ("second", [
        ("second", 1.0, ("s", "sec", "second", "seconds")),
        ("millisecond", 1.0e-3, ("ms", "millisecond", "milliseconds")),
        ("minute", 60.0, ("min", "minute", "minutes")),
        ("hour", 3600.0, ("h", "hr", "hour", "hours")),
        ("day", 86400.0, ("day", "days")),
        ("week", 604800.0, ("week", "weeks")),
        ("year", 31536000.0, ("yr", "year", "years")),
    ]),
    "Volume": ("cubicMetre", [
        ("cubicMetre", 1.0, ("m3", "m³", "cubic metre", "cubicmetre")),
        ("litre", 1.0e-3, ("l", "litre", "liter", "litres", "liters")),
        ("millilitre", 1.0e-6, ("ml", "millilitre", "milliliter")),
        ("gallon", 0.003785411784, ("gal", "gallon", "gallons")),
        ("cubicKilometre", 1.0e9, ("km3", "km³", "cubic kilometre", "cubickilometre")),
    ]),
    "Speed": ("metrePerSecond", [
        ("metrePerSecond", 1.0, ("m/s", "mps", "metre per second")),
        ("kilometrePerHour", 1.0 / 3.6, ("km/h", "kmh", "kph", "kilometres per hour")),
        ("milePerHour", 0.44704, ("mph", "miles per hour")),
        ("knot", 0.514444, ("knot", "knots", "kn")),
    ]),
    "Power": ("watt", [
        ("watt", 1.0, ("w", "watt", "watts")),
        ("kilowatt", 1.0e3, ("kw", "kilowatt", "kilowatts")),
        ("megawatt", 1.0e6, ("mw", "megawatt", "megawatts")),
        ("horsepower", 745.699872, ("hp", "horsepower")),
    ]),
    "Energy": ("joule", [
        ("joule", 1.0, ("j", "joule", "joules")),
        ("kilojoule", 1.0e3, ("kj", "kilojoule", "kilojoules")),
        ("calorie", 4.184, ("cal", "calorie", "calories")),
        ("kilowattHour", 3.6e6, ("kwh", "kilowatt hour", "kilowatt-hours")),
    ]),
    "InformationUnit": ("byte", [
        ("byte", 1.0, ("b", "byte", "bytes")),
        ("kilobyte", 1.0e3, ("kb", "kilobyte", "kilobytes")),
        ("megabyte", 1.0e6, ("mb", "megabyte", "megabytes")),
        ("gigabyte", 1.0e9, ("gb", "gigabyte", "gigabytes")),
        ("terabyte", 1.0e12, ("tb", "terabyte", "terabytes")),
    ]),
    "Numbers": ("one", [
        ("thousand", 1.0e3, ("thousand", "k")),
        ("million", 1.0e6, ("million", "mio", "mn")),
        ("billion", 1.0e9, ("billion", "bn")),
        ("trillion", 1.0e12, ("trillion",)),
    ]),
    # --- the remaining reference families (Convertible/*.txt surfaces with
    # our own public conversion factors).  Two reference data-file factors
    # are physically wrong and intentionally diverged from: hectopascal
    # (0.01 there, 100 Pa here) and newtonCentimetre (0.001 there, 0.01 Nm
    # here).  Abbreviations that lowercase onto an earlier family's key
    # ("mn"→million, "kn"→knot, "mb"→megabyte) resolve to the earlier
    # family; the full subunit name always works. ---
    "Pressure": ("pascal", [
        ("pascal", 1.0, ("pa", "pascal")),
        ("millipascal", 1.0e-3, ("millipascal",)),
        ("hectopascal", 100.0, ("hpa", "hectopascal")),
        ("kilopascal", 1.0e3, ("kpa", "kilopascal")),
        ("megapascal", 1.0e6, ("mpa", "megapascal")),
        ("millibar", 100.0, ("mbar", "millibar")),
        ("decibar", 1.0e4, ("dbar", "decibar")),
        ("bar", 1.0e5, ("bar",)),
        ("standardAtmosphere", 101325.0, ("atm", "standardatmosphere")),
        ("poundPerSquareInch", 6894.757293168, ("psi", "poundpersquareinch")),
        ("torr", 133.3223684211, ("torr", "mmhg")),
    ]),
    "Force": ("newton", [
        ("newton", 1.0, ("n", "newton", "newtons")),
        ("nanonewton", 1.0e-9, ("nn", "nanonewton")),
        ("millinewton", 1.0e-3, ("millinewton",)),
        ("kilonewton", 1.0e3, ("kilonewton",)),
        ("meganewton", 1.0e6, ("meganewton",)),
        ("giganewton", 1.0e9, ("gn", "giganewton")),
        ("tonneForce", 9806.65, ("tf", "t-f", "tonne-force", "tonneforce")),
        ("kilogramForce", 9.80665, ("kgf", "kg-f", "kilogram-force", "kilogramforce", "kilopond", "kp")),
        ("gramForce", 9.80665e-3, ("gf", "g-f", "gram-force", "gramforce", "pond")),
        ("poundal", 0.138254954376, ("pdl", "poundal")),
        ("poundForce", 4.4482216152605, ("lbf", "pound-force", "poundforce")),
    ]),
    "Frequency": ("hertz", [
        ("hertz", 1.0, ("hz", "hertz")),
        ("millihertz", 1.0e-3, ("millihertz",)),
        ("kilohertz", 1.0e3, ("khz", "kilohertz")),
        ("megahertz", 1.0e6, ("mhz", "megahertz")),
        ("gigahertz", 1.0e9, ("ghz", "gigahertz")),
        ("terahertz", 1.0e12, ("thz", "terahertz")),
    ]),
    "Voltage": ("volt", [
        ("volt", 1.0, ("v", "volt", "volts")),
        ("megavolt", 1.0e6, ("megavolt",)),
        ("kilovolt", 1.0e3, ("kv", "kilovolt")),
        ("millivolt", 1.0e-3, ("mv", "millivolt")),
        ("microvolt", 1.0e-6, ("µv", "uv", "microvolt")),
    ]),
    "ElectricCurrent": ("ampere", [
        ("ampere", 1.0, ("a", "ampere", "amperes", "amp", "amps")),
        ("kiloampere", 1.0e3, ("ka", "kiloampere")),
        ("milliampere", 1.0e-3, ("ma", "milliampere")),
        ("microampere", 1.0e-6, ("µa", "ua", "microampere")),
    ]),
    "Density": ("kilogramPerCubicMetre", [
        ("kilogramPerCubicMetre", 1.0, ("kg/m³", "kg/m3", "kg·m−3", "kilogrampercubicmetre")),
        ("kilogramPerLitre", 1.0e3, ("kg/l", "kilogramperlitre")),
        ("gramPerCubicCentimetre", 1.0e3, ("g/cc", "g/cm3", "g/cm³", "grampercubiccentimetre")),
        ("gramPerMillilitre", 1.0e3, ("g/ml", "grampermillilitre")),
    ]),
    "Torque": ("newtonMetre", [
        ("newtonMetre", 1.0, ("nm", "n.m", "n·m", "newtonmetre", "newton-metre")),
        ("newtonMillimetre", 1.0e-3, ("nmm", "newtonmillimetre")),
        ("newtonCentimetre", 1.0e-2, ("ncm", "newtoncentimetre")),
        ("poundFoot", 1.3558179483314, ("ftlb-f", "ftlbf", "lbft", "poundfoot")),
    ]),
    "FuelEfficiency": ("kilometresPerLitre", [
        ("kilometresPerLitre", 1.0, ("km/l", "kilometresperlitre", "kilometres per litre")),
        ("milesPerGallonUS", 0.4251437075, ("mpg", "milespergallon", "miles per gallon")),
    ]),
    "FlowRate": ("cubicMetrePerSecond", [
        ("cubicMetrePerSecond", 1.0, ("m³/s", "m3/s", "cubicmetrepersecond")),
        ("cubicFeetPerSecond", 0.028316846592, ("ft³/s", "ft3/s", "cuft/s", "cubicfeetpersecond")),
        ("cubicMetrePerYear", 1.0 / 31536000.0, ("m³/y", "m3/y", "cubicmetreperyear")),
        ("cubicFeetPerYear", 0.028316846592 / 31536000.0, ("ft³/y", "ft3/y", "cubicfeetperyear")),
    ]),
    "PopulationDensity": ("inhabitantsPerSquareKilometre", [
        ("inhabitantsPerSquareKilometre", 1.0,
         ("pd/sqkm", "/sqkm", "/km²", "/km2", "per square kilometre",
          "inhabitants per square kilometre", "inhabitantspersquarekilometre")),
        ("inhabitantsPerSquareMile", 0.3861021585,
         ("pd/sqmi", "/sqmi", "per square mile", "inhabitants per square mile",
          "inhabitantspersquaremile")),
    ]),
    "LinearMassDensity": ("gramPerKilometre", [
        ("gramPerKilometre", 1.0, ("g/km", "gramperkilometre")),
        ("kilogramPerKilometre", 1.0e3, ("kg/km", "kilogramperkilometre")),
        ("gramPerMetre", 1.0e3, ("g/m", "grampermetre")),
    ]),
    # --- Temperature (reference surface: Units/Temperature.txt; offset-aware
    # conversion K = (value + offset) × rate — the file's rate/offset pairs
    # reproduce °C→K (25°C = 298.15 K), °F→K, °R→K.  NOTE: the reference's
    # loader (UnitManager.loadUnits:49-55) never actually reads that file, so
    # this family is a completion of the shipped-but-unwired surface.
    # Bare "c"/"f" clash with nothing earlier; "k" stays with Numbers
    # (thousand) per first-writer precedence — kelvin needs "°k"/"kelvin". ---
    "Temperature": ("kelvin", [
        ("kelvin", 1.0, ("°k", "kelvin", "kelvins"), 0.0),
        ("degreeCelsius", 1.0, ("°c", "c", "celsius", "degc",
                                "degree celsius", "degreecelsius"), 273.15),
        ("degreeFahrenheit", 5.0 / 9.0, ("°f", "f", "fahrenheit", "degf",
                                         "degree fahrenheit",
                                         "degreefahrenheit"), 459.67),
        ("degreeRankine", 5.0 / 9.0, ("°r", "rankine", "degree rankine",
                                      "degreerankine"), 0.0),
    ]),
    # --- Currency (reference surface: Units/Currency.txt — identification
    # ONLY: the reference file carries names + abbreviations and NO
    # conversion rates (SubUnit.setConvertible(false)), so every rate is 1.0
    # and base_value == value.  Codes/symbols are public ISO-4217 data. ---
    "Currency": ("currency", [
        ("usDollar", 1.0, ("$", "usd", "us$", "dollar", "dollars",
                           "us dollar", "us dollars")),
        ("euro", 1.0, ("€", "eur", "euro", "euros")),
        ("poundSterling", 1.0, ("£", "gbp", "pound sterling",
                                "british pound")),
        ("japaneseYen", 1.0, ("¥", "jpy", "yen", "japanese yen")),
        ("swissFranc", 1.0, ("chf", "swiss franc")),
        ("canadianDollar", 1.0, ("cad", "c$", "canadian dollar")),
        ("australianDollar", 1.0, ("aud", "a$", "australian dollar")),
        ("renminbi", 1.0, ("cny", "rmb", "renminbi", "yuan")),
        ("indianRupee", 1.0, ("inr", "₹", "indian rupee", "rupee", "rupees")),
        ("russianRouble", 1.0, ("rub", "rur", "rouble", "ruble",
                                "russian rouble")),
        ("brazilianReal", 1.0, ("brl", "r$", "brazilian real")),
        ("southKoreanWon", 1.0, ("krw", "₩", "won", "south korean won")),
        ("mexicanPeso", 1.0, ("mxn", "mexican peso")),
        ("southAfricanRand", 1.0, ("zar", "rand", "south african rand")),
        ("swedishKrona", 1.0, ("sek", "kr", "swedish krona")),
        ("norwegianKrone", 1.0, ("nok", "norwegian krone")),
        ("danishKrone", 1.0, ("dkk", "danish krone")),
        ("polishZloty", 1.0, ("pln", "zł", "zloty")),
        ("czechKoruna", 1.0, ("czk", "kč", "czech koruna")),
        ("hungarianForint", 1.0, ("huf", "forint")),
        ("turkishLira", 1.0, ("try", "₺", "turkish lira", "lira")),
        ("israeliNewSheqel", 1.0, ("ils", "₪", "sheqel", "shekel")),
        ("singaporeDollar", 1.0, ("sgd", "s$", "singapore dollar")),
        ("hongKongDollar", 1.0, ("hkd", "hk$", "hong kong dollar")),
        ("newZealandDollar", 1.0, ("nzd", "nz$", "new zealand dollar")),
        ("thaiBaht", 1.0, ("thb", "฿", "baht")),
        ("indonesianRupiah", 1.0, ("idr", "rupiah")),
        ("malaysianRinggit", 1.0, ("myr", "ringgit")),
        ("philippinePeso", 1.0, ("php", "₱", "philippine peso")),
        ("vietnameseDong", 1.0, ("vnd", "₫", "dong")),
        ("pakistaniRupee", 1.0, ("pkr", "pakistani rupee")),
        ("bangladeshiTaka", 1.0, ("bdt", "৳", "taka")),
        ("nigerianNaira", 1.0, ("ngn", "₦", "naira")),
        ("egyptianPound", 1.0, ("egp", "egyptian pound")),
        ("kenyanShilling", 1.0, ("kes", "kenyan shilling")),
        ("saudiRiyal", 1.0, ("sar", "saudi riyal", "riyal")),
        ("uaeDirham", 1.0, ("aed", "dirham", "united arab emirates dirham")),
        ("qatariRial", 1.0, ("qar", "qatari rial")),
        ("kuwaitiDinar", 1.0, ("kwd", "kuwaiti dinar")),
        ("chileanPeso", 1.0, ("clp", "chilean peso")),
        ("argentinePeso", 1.0, ("ars", "argentine peso")),
        ("colombianPeso", 1.0, ("cop", "colombian peso")),
        ("peruvianSol", 1.0, ("pen", "nuevo sol", "sol")),
        ("ukrainianHryvnia", 1.0, ("uah", "₴", "hryvnia")),
        ("romanianLeu", 1.0, ("ron", "romanian new leu")),
        ("bulgarianLev", 1.0, ("bgn", "bulgarian lev", "lev")),
        ("croatianKuna", 1.0, ("hrk", "croatian kuna", "kuna")),
        ("icelandKrona", 1.0, ("isk", "iceland krona")),
        ("taiwanDollar", 1.0, ("twd", "nt$", "new taiwan dollar")),
    ]),
}

# abbreviation (lowercase, spaces stripped) -> SubUnit
_ABBR_TO_SUBUNIT: dict[str, SubUnit] = {}
for _family, (_base, _subs) in _UNIT_TABLES.items():
    for _entry in _subs:
        _name, _rate, _abbrs = _entry[0], _entry[1], tuple(_entry[2])
        _offset = _entry[3] if len(_entry) > 3 else 0.0
        su = SubUnit(name=_name, family=_family, base_name=_base, rate=_rate,
                     abbreviations=tuple(_abbrs), offset=_offset)
        for _a in _abbrs + (_name.lower(),):
            key = _a.lower().replace(" ", "")
            # first writer wins so earlier families take precedence on clashes
            _ABBR_TO_SUBUNIT.setdefault(key, su)

_NUMBER_RE = re.compile(r"([\d.,]+)")


@dataclass(frozen=True)
class ParsedUnit:
    subunit: SubUnit
    value: float          # original magnitude
    base_value: float     # value converted to the family base unit

    @property
    def base_unit(self) -> str:
        return self.subunit.base_name


# header-hint → residue-suffix key, memoized per worker (hints are per-COLUMN
# strings, reused across every cell of the column).  None marks hints the
# fast path must not handle: a '-' in the hint flips the combined string's
# negative detection, and non-space whitespace interacts with the combined
# string's strip() — keep the exact concat semantics for those.
_HINT_KEY_CACHE: dict[str, str | None] = {}
_ODD_WS_RE = re.compile(r"[^\S ]")  # whitespace other than a plain space


def _hint_key(hint: str) -> str | None:
    k = _HINT_KEY_CACHE.get(hint, _NUMBER_RE)  # sentinel: cache may hold None
    if k is _NUMBER_RE:
        k = None if ("-" in hint or _ODD_WS_RE.search(hint)) \
            else hint.lower().replace(" ", "")
        _HINT_KEY_CACHE[hint] = k
    return k


def parse_unit(text: str, header_hint: str | None = None) -> ParsedUnit | None:
    """Parse '892sqkm' / '3,5 km' / '-12 mph' style values.  ``header_hint``
    is the bracket content of the column header (e.g. 'sq. km.') appended when
    the cell itself has no unit (ColumnTypeGuesser.java:60-66).

    Hot path: the text is tokenized ONCE and the hint retry is a dict lookup
    on ``residue + hint_key`` — equivalent to re-parsing ``text + " " + hint``
    (all spaces are stripped from residues, and the number always comes from
    the text when the text has one), without the per-cell concat + rescan.
    Hints containing '-' or number-less texts fall back to the exact
    combined-string parse."""
    if not text:
        return None
    parts = _parse_unit_parts(text)
    if parts is None:
        # no parsable number in the text itself: the combined string may
        # still parse (number supplied by the hint) — rare, keep exact path
        if header_hint:
            return _parse_unit_text(text + " " + header_hint)
        return None
    value, residue = parts
    su = _ABBR_TO_SUBUNIT.get(residue) if residue else None
    if su is None and header_hint:
        hk = _hint_key(header_hint)
        if hk is None or _ODD_WS_RE.search(text):
            return _parse_unit_text(text + " " + header_hint)
        su = _ABBR_TO_SUBUNIT.get(residue + hk)
    if su is None:
        return None
    return ParsedUnit(subunit=su, value=value,
                      base_value=(value + su.offset) * su.rate)


def _parse_unit_parts(text: str) -> tuple[float, str] | None:
    """(signed value, normalized residue) — or None when no number parses."""
    # cheap reject before any string copies: a unit value needs a number
    m = _NUMBER_RE.search(text)
    if m is None:
        return None
    if "-" in text:
        text = text.replace("-", " ", 1)
        m = _NUMBER_RE.search(text)
        if not m:
            return None
        sign = -1.0
    else:
        sign = 1.0
    num_str = m.group(1)
    try:
        value = float(num_str.replace(",", "."))
    except ValueError:
        return None
    residue = text.replace(num_str, "", 1).strip().lower().replace(" ", "")
    return sign * value, residue


def _parse_unit_text(text: str) -> ParsedUnit | None:
    parts = _parse_unit_parts(text)
    if parts is None:
        return None
    value, residue = parts
    if not residue:
        return None
    su = _ABBR_TO_SUBUNIT.get(residue)
    if su is None:
        return None
    return ParsedUnit(subunit=su, value=value,
                      base_value=(value + su.offset) * su.rate)


_HEADER_BRACKET_RE = re.compile(r".*\((.*?)\).*")


def extract_unit_abbr_from_header(header: str) -> str:
    """Bracket content of a header, dots removed ('area (sq. km.)' → 'sq km');
    whole header when no brackets (ColumnTypeGuesser.java:105-115)."""
    m = _HEADER_BRACKET_RE.match(header)
    if m:
        return m.group(1).replace(".", "")
    return header
