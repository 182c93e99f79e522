"""functions/classify.py vs verbatim replicas of the reference rules
(variables/classification.py:62-95 classify_variable,
qaqc/measurements.py:165-200 detect_measurement /
corrections_for_measurement), over a name battery that hits every rule
and boundary case."""

import numpy as np

from diive_ray.functions.classify import (
    CLASS_RULES,
    classify_variables,
    corrections_for_codes,
    detect_measurements,
)
from diive_ray.pipelines.queries import _VARNAME_BATTERY


def _ref_classify(name):
    if name == "FC" or name.startswith("FC_"):
        return ("FC", "carbon")
    if name == "TA":
        return ("TA", "meteo")
    for prefix, kind, category in CLASS_RULES:
        if name.startswith(prefix):
            return (kind, category)
    return ("none", "none")


_MEAS = [("SWC", "SWC"), ("SW_", "SW"), ("SW", "SW"), ("PPFD", "PPFD"),
         ("LW", "LW"), ("RH", "RH"), ("VPD", "VPD"), ("TA", "TA"),
         ("Tair", "TA"), ("TS", "TS"), ("PREC", "PREC"), ("PA", "PA"),
         ("WS", "WS"), ("WD", "WD"), ("G_", "G")]


def _ref_measure(name):
    for prefix, code in _MEAS:
        if name.startswith(prefix):
            return code
    return "none"


def _ref_corrections(code):
    specific = {"SW": "radiation_zero_offset", "PPFD": "radiation_zero_offset",
                "RH": "relativehumidity_offset"}
    generic = "setto_max,setto_min,setto_value,set_exact_to_missing"
    return (specific[code] + "," + generic) if code in specific else generic


NAMES = _VARNAME_BATTERY + [
    "FCH4", "FC_", "TARGET", "SWCX", "SW", "PPFD", "Tair", "GPPx", "LE", "LEx"]


def test_classify_matches_reference_rules():
    kind, cat = classify_variables(NAMES)
    want = [_ref_classify(n) for n in NAMES]
    assert kind.tolist() == [w[0] for w in want]
    assert cat.tolist() == [w[1] for w in want]
    # the boundary cases specifically
    by = dict(zip(NAMES, zip(kind, cat)))
    assert by["FC"] == ("FC", "carbon")
    assert by["FCH4"] == ("FCH4", "carbon")     # word boundary: not FC
    assert by["TA"] == ("TA", "meteo")
    assert by["TAU"] == ("none", "none")        # bare-TA exact only
    assert by["LE"] == ("none", "none")         # LE_ needs the underscore
    assert by["UNKNOWN_VAR"] == ("none", "none")


def test_measurement_and_corrections_match_reference():
    code = detect_measurements(NAMES)
    assert code.tolist() == [_ref_measure(n) for n in NAMES]
    by = dict(zip(NAMES, code))
    assert by["SWC_1_1_1"] == "SWC"             # SWC before SW
    assert by["SW_OUT"] == "SW"
    assert by["TAU"] == "TA"                    # measurement TA prefix catches TAU
    corr = corrections_for_codes(code)
    assert corr.tolist() == [_ref_corrections(c) for c in code]
    assert corr[NAMES.index("SW_OUT")].startswith("radiation_zero_offset,")
    assert corr[NAMES.index("RH_T1_2_1")].startswith("relativehumidity_offset,")


def test_none_and_non_string_safe():
    kind, cat = classify_variables(np.array([None, "NEE"], dtype=object))
    assert kind.tolist() == ["none", "NEE"]
