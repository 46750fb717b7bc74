"""Scalar formatting functions X1-X3 -- byte-exact replicas of the
reference's quirks (SURVEY.md §2.7). These run driver-side on report-sized
results only (never in the distributed hot path), so plain Python is correct
here; quirks are replicated, not fixed.

- human_bytes: Util.java:42-52 -- SI units (kB = 1000), ``"%.1f %sB"``,
  values < 1000 render as ``"N B"``.
- format_timestamp_ms / format_deletion_time: Util.java:18-27 +
  SSTableMetadataCollector.java:75-80 -- UTC ``yyyy-MM-dd HH:mm:ss.SSS``;
  microsecond inputs are divided by 1000 first; deletion times (seconds) are
  multiplied by 1000; the Integer.MAX_VALUE sentinel renders as "".
- human_date_diff: Util.java:66-98 -- ``"Nd Nh Nm Ns"`` with the quirks:
  minutes and seconds are ALWAYS emitted (even "0m"); days/hours only when
  >= 1; separator spaces are inserted via ``sb.length() > 1`` checks, so
  "1d" alone (length 2) still gets a space before minutes, and days with
  zero hours renders "2d 0m 5s" (hours omitted); seconds use ceil.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from decimal import ROUND_HALF_UP, Decimal

LDT_SENTINEL = 2_147_483_647


def _java_1dp(x: float) -> str:
    """Java String.format("%.1f") rounds HALF_UP over the double's exact
    decimal expansion; Python's % rounds half-even -- use Decimal to match."""
    return str(Decimal(x).quantize(Decimal("0.1"), rounding=ROUND_HALF_UP))


def human_bytes(n: int, si: bool = True) -> str:
    """Util.java:42-52: humanReadableByteCount(bytes, si=true)."""
    unit = 1000 if si else 1024
    if n < unit:
        return f"{n} B"
    exp = int(math.log(n) / math.log(unit))
    pre = ("kMGTPE" if si else "KMGTPE")[exp - 1] + ("" if si else "i")
    return f"{_java_1dp(n / unit**exp)} {pre}B"


def format_timestamp_ms(ms: int) -> str:
    """Util.java:18-27: UTC yyyy-MM-dd HH:mm:ss.SSS from epoch millis."""
    dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{ms % 1000:03d}"


def format_timestamp_us(us: int) -> str:
    """Microsecond writetime -> displayed at ms precision (divides by 1000
    first, SSTableMetadataCollector.java:75-78)."""
    return format_timestamp_ms(us // 1000)


def format_deletion_time(seconds: int) -> str:
    """Deletion times are seconds; sentinel Integer.MAX_VALUE -> blank
    (SSTableMetadataCollector.java:79-80)."""
    if seconds == LDT_SENTINEL:
        return ""
    return format_timestamp_ms(seconds * 1000)


def human_date_diff(start_ms: int, end_ms: int) -> str:
    """Util.java:66-98 -- faithful transcription of the builder logic."""
    diff = end_ms - start_ms
    sb = ""
    days = diff // 86_400_000
    diff -= days * 86_400_000
    if days >= 1:
        sb += f"{days}d"
    hours = diff // 3_600_000
    diff -= hours * 3_600_000
    if hours >= 1:
        if len(sb) > 1:
            sb += " "
        sb += f"{hours}h"
    if len(sb) > 1:
        sb += " "
    minutes = diff // 60_000
    diff -= minutes * 60_000
    sb += f"{minutes}m "
    sb += f"{math.ceil(diff / 1000.0)}s"
    return sb
