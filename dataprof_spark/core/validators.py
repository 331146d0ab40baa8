"""Checksum / semantic validators (reference validators.rs behavior,
re-implemented from the public algorithms — Luhn, IBAN mod-97, Codice
Fiscale check character, P.IVA check digit, SSN area rules, IPv6
standard parse, coordinate ranges with decimal-comma disambiguation).

Pure functions on already-regex-matched strings; the pass rate feeds
the pattern confidence formula (core/patterns.py).
"""

from __future__ import annotations

import ipaddress

# Codice Fiscale check-character tables (standard public algorithm)
_CF_ODD = {
    "0": 1, "1": 0, "2": 5, "3": 7, "4": 9, "5": 13, "6": 15, "7": 17,
    "8": 19, "9": 21, "A": 1, "B": 0, "C": 5, "D": 7, "E": 9, "F": 13,
    "G": 15, "H": 17, "I": 19, "J": 21, "K": 2, "L": 4, "M": 18,
    "N": 20, "O": 11, "P": 3, "Q": 6, "R": 8, "S": 12, "T": 14,
    "U": 16, "V": 10, "W": 22, "X": 25, "Y": 24, "Z": 23,
}
_CF_EVEN = {
    **{str(d): d for d in range(10)},
    **{chr(ord("A") + i): i for i in range(26)},
}


def luhn(s: str) -> bool:
    """Standard Luhn checksum over the digits of s (credit cards)."""
    digits = [int(c) for c in s if c.isdigit()]
    if len(digits) < 12:
        return False
    total = 0
    for i, d in enumerate(reversed(digits)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def iban_mod97(s: str) -> bool:
    """Standard IBAN check: move first 4 chars to the end, A=10..Z=35,
    integer mod 97 == 1. Length must be plausible (15..34)."""
    s = s.replace(" ", "").upper()
    if not (15 <= len(s) <= 34):
        return False
    rearranged = s[4:] + s[:4]
    num = ""
    for ch in rearranged:
        if ch.isdigit():
            num += ch
        elif ch.isalpha():
            num += str(ord(ch) - ord("A") + 10)
        else:
            return False
    return int(num) % 97 == 1


def codice_fiscale(s: str) -> bool:
    """Italian Codice Fiscale: 16 chars, final char is the standard
    odd/even-position checksum character."""
    s = s.upper()
    if len(s) != 16:
        return False
    total = 0
    for i, ch in enumerate(s[:15]):
        table = _CF_ODD if (i % 2 == 0) else _CF_EVEN  # 1-based odd
        if ch not in table:
            return False
        total += table[ch]
    return s[15] == chr(ord("A") + total % 26)


def piva_it(s: str) -> bool:
    """Italian P.IVA: 11 digits, standard check-digit algorithm."""
    if len(s) != 11 or not s.isdigit():
        return False
    total = 0
    for i, ch in enumerate(s[:10]):
        d = int(ch)
        if i % 2 == 0:  # odd positions (1-based)
            total += d
        else:
            d *= 2
            total += d - 9 if d > 9 else d
    check = (10 - total % 10) % 10
    return int(s[10]) == check


def ssn_us(s: str) -> bool:
    """US SSN area rules: area not 000/666/9xx, group not 00, serial
    not 0000 (reference validate_ssn_us behavior)."""
    digits = s.replace("-", "")
    if len(digits) != 9 or not digits.isdigit():
        return False
    area, group, serial = digits[:3], digits[3:5], digits[5:]
    if area in ("000", "666") or area.startswith("9"):
        return False
    return group != "00" and serial != "0000"


def ipv6(s: str) -> bool:
    """Real IPv6 parse (the regex is only a loose prefilter)."""
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def coordinates(s: str) -> bool:
    """lat,lon ranges with the reference's decimal-comma disambiguation
    (validators.rs:19-51): `1.234,56`-shaped values are locale-
    formatted decimals, not coordinates."""
    if "," not in s:
        return False
    lat_raw, lon_raw = s.split(",", 1)
    has_ws = lon_raw[:1].isspace() if lon_raw else False
    lat, lon = lat_raw.strip(), lon_raw.strip()
    if (
        not has_ws
        and not lon.startswith(("+", "-"))
        and len(lon) == 2
        and lon.isdigit()
    ):
        unsigned = lat.lstrip("+-")
        if "." in unsigned:
            whole, frac = unsigned.split(".", 1)
            if 1 <= len(whole) <= 3 and whole.isdigit() and len(frac) == 3 and frac.isdigit():
                return False
    try:
        la, lo = float(lat), float(lon)
    except ValueError:
        return False
    return -90.0 <= la <= 90.0 and -180.0 <= lo <= 180.0


def cap_it(s: str) -> bool:
    """Italian CAP range 00010-98168 (validators.rs:55-61)."""
    try:
        return 10 <= int(s) <= 98168
    except ValueError:
        return False
