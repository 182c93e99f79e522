"""Variable-name classification + measurement detection — the
metadata layer the reference uses to auto-assign screening and
correction specs to columns.

Reference: diive/variables/classification.py:25-95 (classify_variable
prefix rules, FC word-boundary and bare-TA special cases) and
diive/preprocessing/qaqc/measurements.py:123-200 (detect_measurement
prefix table, corrections_for_measurement ordering).

Vectorized: one boolean startswith mask per rule + np.select — first
match wins in the reference's exact rule order. Unmatched names map to
the string sentinel ``'none'`` (hash-stable vs NULL)."""

from __future__ import annotations

import numpy as np
import pandas as pd

# classification.py:41-59 — (prefix, kind, category), first match wins.
CLASS_RULES: tuple[tuple[str, str, str], ...] = (
    ("NEE", "NEE", "carbon"),
    ("GPP", "GPP", "carbon"),
    ("Reco", "Reco", "carbon"),
    ("FCH4", "FCH4", "carbon"),
    ("FN2O", "FN2O", "nitrogen"),
    ("FH2O", "FH2O", "water"),
    ("LE_", "LE", "water"),
    ("ET_", "ET", "water"),
    ("Rg_", "Rg", "radiation"),
    ("SW_IN_", "SW_IN", "radiation"),
    ("PPFD", "PPFD", "radiation"),
    ("PAR_", "PAR", "radiation"),
    ("LW_", "LW", "radiation"),
    ("Tair", "TA", "meteo"),
    ("TA_", "TA", "meteo"),
    ("VPD", "VPD", "meteo"),
    ("SWC", "SWC", "soil"),
)

# measurements.py:131-147 — (prefix, code), first match wins.
MEAS_PREFIXES: tuple[tuple[str, str], ...] = (
    ("SWC", "SWC"), ("SW_", "SW"), ("SW", "SW"), ("PPFD", "PPFD"),
    ("LW", "LW"), ("RH", "RH"), ("VPD", "VPD"), ("TA", "TA"),
    ("Tair", "TA"), ("TS", "TS"), ("PREC", "PREC"), ("PA", "PA"),
    ("WS", "WS"), ("WD", "WD"), ("G_", "G"),
)

GENERIC_CORRECTIONS = "setto_max,setto_min,setto_value,set_exact_to_missing"

# measurements.py:165-185 — specific corrections prepend in canonical
# CORRECTIONS order (radiation_zero_offset < relativehumidity_offset
# < generics).
CORRECTIONS_BY_CODE: dict[str, str] = {
    "SW": "radiation_zero_offset," + GENERIC_CORRECTIONS,
    "PPFD": "radiation_zero_offset," + GENERIC_CORRECTIONS,
    "RH": "relativehumidity_offset," + GENERIC_CORRECTIONS,
}


def classify_variables(names) -> tuple[np.ndarray, np.ndarray]:
    """(kind, category) per name — classify_variable vectorized.
    Special cases first: ``FC`` / ``FC_*`` is the CO2 flux (word
    boundary so FCH4 stays methane), bare ``TA`` exact-matches (a TA
    prefix would also catch TAU/TARGET)."""
    s = pd.Series(np.asarray(names, dtype=object))
    conds = [s.eq("FC") | s.str.startswith("FC_", na=False), s.eq("TA")]
    kinds = ["FC", "TA"]
    cats = ["carbon", "meteo"]
    for prefix, kind, cat in CLASS_RULES:
        conds.append(s.str.startswith(prefix, na=False))
        kinds.append(kind)
        cats.append(cat)
    return (
        np.select(conds, kinds, default="none"),
        np.select(conds, cats, default="none"),
    )


def detect_measurements(names) -> np.ndarray:
    """Measurement code per name — detect_measurement vectorized."""
    s = pd.Series(np.asarray(names, dtype=object))
    conds, codes = [], []
    for prefix, code in MEAS_PREFIXES:
        conds.append(s.str.startswith(prefix, na=False))
        codes.append(code)
    return np.select(conds, codes, default="none")


def corrections_for_codes(codes: np.ndarray) -> np.ndarray:
    """Comma-joined applicable correction keys per measurement code —
    corrections_for_measurement vectorized (unknown code -> generics
    only)."""
    s = pd.Series(np.asarray(codes, dtype=object))
    return s.map(lambda c: CORRECTIONS_BY_CODE.get(c, GENERIC_CORRECTIONS)).to_numpy()
