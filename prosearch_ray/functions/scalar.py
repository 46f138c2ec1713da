"""Scalar/string helpers mirroring the reference's utility surface
(SURVEY.md §2.9)."""

from __future__ import annotations

_UNITS = ["bytes", "kB", "MB", "GB", "TB", "PB"]


def pretty_size(n_bytes: int) -> str:
    """Postgres ``pg_size_pretty`` semantics (used by the reference's stats
    page, /root/reference/src/main/java/com/milindmantri/
    StatisticsHttpHandler.java:39): bytes below 10*1024, then kB/MB/... with
    round-half-to-even at each step."""
    n = int(n_bytes)
    if abs(n) < 10 * 1024:
        return f"{n} bytes"
    val = float(n)
    for unit in _UNITS[1:]:
        val = val / 1024.0
        if abs(val) < 10 * 1024 or unit == _UNITS[-1]:
            # pg rounds half to even on the integer result
            import decimal

            d = decimal.Decimal(val).quantize(0, rounding=decimal.ROUND_HALF_EVEN)
            return f"{d} {unit}"
    raise AssertionError("unreachable")


def remove_scheme(uri: str) -> str:
    """Doc identity for stats strips the scheme: authority + path + ?query
    (/root/reference/src/main/java/com/milindmantri/Manager.java:304-317)."""
    if "://" in uri:
        return uri.split("://", 1)[1]
    return uri
