"""Datetime-string parsing with format search + mergeable format cache.

Reimplements the reference's date mini-type-system (Profiler.py:96-200)
Ray-natively: instead of trying ~10^4 strftime permutations row-by-row in
pandas, we (1) keep a deterministic candidate list (common formats first,
then generated permutations), (2) search for the winning format on a small
SAMPLE of each batch with ``pyarrow.compute.strptime``, then (3) parse the
full column vectorized with the winner. The per-column winning format is
cached in a counter that merges across actors/batches (counter sum — the
distributed analog of the reference's pickled ``format_cache``,
Profiler.py:126-135), and the winner is resolved deterministically
(highest count, then candidate-list order) so distributed runs are
reproducible (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

# Common formats tried first (mirrors the spirit of Profiler.py:161-178).
COMMON_FORMATS = [
    "%Y-%m-%d",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d",
    "%Y/%m/%d %H:%M:%S",
    "%m/%d/%Y",
    "%m/%d/%Y %H:%M:%S",
    "%d/%m/%Y",
    "%d/%m/%Y %H:%M:%S",
    "%m-%d-%Y",
    "%d-%m-%Y",
    "%d-%m-%Y %H:%M:%S",
    "%Y%m%d",
    "%d %b %Y",
    "%d %B %Y",
    "%b %d, %Y",
    "%B %d, %Y",
    "%Y-%m-%d %H:%M",
    "%m/%d/%y",
    "%d.%m.%Y",
    "%Y.%m.%d",
    "%H:%M:%S",
]


def _generated_formats() -> list[str]:
    """Deterministic permutation list (date orders × separators × time
    suffixes) mirroring the reference's ~10^4 strftime permutations
    (Profiler.py:96-123). Order encodes disambiguation preference:
    4-digit-year numeric orders, then month-name orders, then 2-digit
    years, then compact (separator-less) forms — a string matching an
    earlier candidate never falls through to a later one, so
    distributed runs stay reproducible."""
    out = []
    times = ["", " %H:%M:%S", " %H:%M", "T%H:%M:%S", " %I:%M:%S %p",
             " %H:%M:%S.%f", " %I:%M %p", " %H:%M:%S %f"]
    seps = ["-", "/", ".", " "]

    def _emit(parts_list, seps_list):
        for p in parts_list:
            for s in seps_list:
                base = s.join(p)
                for t in times:
                    out.append(base + t)

    # 4-digit-year numeric orders first (unambiguous year position)
    _emit([("%Y", "%m", "%d"), ("%d", "%m", "%Y"), ("%m", "%d", "%Y"),
           ("%Y", "%d", "%m")], seps)
    # month-name orders (11-Mar-2021, Mar 11 2021, 2021 March 11, …)
    _emit([("%d", "%b", "%Y"), ("%b", "%d", "%Y"), ("%Y", "%b", "%d"),
           ("%d", "%B", "%Y"), ("%B", "%d", "%Y")], seps)
    # 2-digit years AFTER every 4-digit candidate (a 4-digit match must
    # never lose to a %y misparse)
    _emit([("%y", "%m", "%d"), ("%d", "%m", "%y"), ("%m", "%d", "%y")],
          seps)
    # compact separator-less stamps
    for base in ("%Y%m%d", "%y%m%d", "%d%m%Y", "%m%d%Y"):
        for t in ("", "%H%M%S", " %H:%M:%S", "T%H:%M:%S"):
            out.append(base + t)
    # ---- the reference's FULL permutation space (Profiler.py:96-123):
    # year-first {y}{sep}{m}{sep}{d} dates (y ∈ %Y/%y, m ∈ %m/%b/%B,
    # d ∈ %d/%j) always followed by a time {h}{ts}{M}{ts}{S}{frac}{ampm}{tz}
    # with no internal spaces (e.g. "%Y-%b-%j %I:%M:%S%p%z") — ~4.6k
    # formats. Appended AFTER every candidate above so existing winners
    # never change; 4-digit years enumerate before 2-digit so a %Y match
    # can't lose to a %y misparse.
    for y in ("%Y", "%y"):
        for m in ("%m", "%b", "%B"):
            for d in ("%d", "%j"):
                for s in seps:
                    base = f"{y}{s}{m}{s}{d}"
                    for h in ("%H", "%I"):
                        for ts1 in (":", ""):
                            for ts2 in (":", ""):
                                for fs in ("", "%f"):
                                    # %p enumerates before %Z at the same
                                    # suffix position: Arrow's %Z happily
                                    # consumes "PM" as a zone name,
                                    # silently dropping the am/pm meaning
                                    # — the %p candidate must win that race
                                    for suffix in ("", "%p", "%p%Z", "%p%z",
                                                   "%Z", "%z"):
                                        out.append(
                                            f"{base} {h}{ts1}%M{ts2}%S"
                                            f"{fs}{suffix}"
                                        )
    seen = set(COMMON_FORMATS)
    return [f for f in out if not (f in seen or seen.add(f))]


ALL_FORMATS = COMMON_FORMATS + _generated_formats()

# ---- regex prefilter: candidate formats are only handed to strptime if
# their shape-regex matches a sample value. With ~5k candidates a linear
# strptime sweep on a non-date column would cost ~100ms/batch; the regex
# gate rejects non-matching candidates at ~1µs each, making the no-match
# path CHEAPER than the old 420-format sweep. Regexes are permissive
# (strptime stays the decider) and are compiled lazily once per worker.
_DIRECTIVE_RE = {
    "%Y": r"\d{4}", "%y": r"\d{2}", "%m": r"\d{1,2}", "%d": r"\d{1,2}",
    "%j": r"\d{1,3}", "%b": r"[A-Za-z]{3}", "%B": r"[A-Za-z]{3,9}",
    "%H": r"\d{1,2}", "%I": r"\d{1,2}", "%M": r"\d{1,2}", "%S": r"\d{1,2}",
    "%f": r"\d{1,6}", "%p": r"[AaPp][Mm]",
    "%z": r"[+-]\d{2}:?\d{2}", "%Z": r"[A-Za-z][A-Za-z0-9/_+\-]{0,31}",
}
_FMT_REGEX: dict = {}


def _fmt_regex(fmt: str):
    import re

    rx = _FMT_REGEX.get(fmt)
    if rx is None:
        pat, i = [], 0
        while i < len(fmt):
            if fmt[i] == "%" and i + 1 < len(fmt):
                d = fmt[i : i + 2]
                pat.append(_DIRECTIVE_RE.get(d, re.escape(d)))
                i += 2
            elif fmt[i] == " ":
                pat.append(r"\s+")  # strptime treats a literal space as
                i += 1              # "one or more whitespace"
            else:
                pat.append(re.escape(fmt[i]))
                i += 1
        rx = _FMT_REGEX[fmt] = re.compile(r"\s*" + "".join(pat) + r"\s*")
    return rx


def _valid_years(ts: pa.Array) -> bool:
    """Semantic validation from the reference (validate_date,
    Profiler.py:139-144): accept only years in [1900, 2100]."""
    if len(ts) == 0:
        return False
    y = pc.year(ts)
    ok = pc.and_(pc.greater_equal(y, 1900), pc.less_equal(y, 2100))
    return pc.all(ok).as_py() is True


def parse_with_format(arr: pa.Array | pa.ChunkedArray, fmt: str) -> pa.Array | None:
    """Parse fully; None unless every non-null value parses with valid years.

    ``%f`` formats route through pandas ``to_datetime`` (vectorized C
    kernel) because Arrow's strptime has no fractional-second directive;
    ``%z`` formats come back tz-aware and are normalized to naive UTC,
    mirroring the reference's ``utc=True`` + ``tz_convert(None)``
    (Profiler.py:148-153)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if "%f" in fmt:
        import pandas as pd

        try:
            s = pd.to_datetime(
                arr.to_pandas(), format=fmt, errors="coerce", utc=True
            ).dt.tz_convert(None)
        except (ValueError, TypeError):
            return None
        parsed = pa.Array.from_pandas(s, type=pa.timestamp("us"))
    else:
        try:
            parsed = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
        except pa.ArrowInvalid:
            return None
        if pa.types.is_timestamp(parsed.type) and parsed.type.tz is not None:
            # tz-aware instants are stored UTC; dropping the zone keeps
            # the UTC wall-clock (reference's tz_convert(None))
            parsed = parsed.cast(pa.timestamp("us"))
    if parsed.null_count > arr.null_count:
        return None
    nn = parsed.drop_null()
    if len(nn) == 0 or not _valid_years(nn):
        return None
    return parsed


def find_format(sample: pa.Array | pa.ChunkedArray, candidates=None) -> str | None:
    """First format (in deterministic candidate order) that parses the
    whole sample with valid years."""
    if isinstance(sample, pa.ChunkedArray):
        sample = sample.combine_chunks()
    sample = sample.drop_null()
    if len(sample) == 0:
        return None
    # regex gate on the first value: only shape-matching candidates reach
    # strptime (see _fmt_regex) — the decider is still the full parse
    probe = sample[0].as_py()
    for fmt in candidates or ALL_FORMATS:
        if probe is not None and _fmt_regex(fmt).fullmatch(probe) is None:
            continue
        if parse_with_format(sample, fmt) is not None:
            return fmt
    return None


# Worker-process-global cache: each Ray worker accumulates (column, fmt)
# hits across the batches it sees, so repeat batches of the same column
# try the known-winning format FIRST (the live analog of the reference's
# consulted-on-every-parse pickled cache, Profiler.py:181-193). Merge
# across workers happens through checkpoint metadata when callers pass
# the cache explicitly.
WORKER_FORMAT_CACHE = None


def get_worker_format_cache() -> "FormatCache":
    global WORKER_FORMAT_CACHE
    if WORKER_FORMAT_CACHE is None:
        WORKER_FORMAT_CACHE = FormatCache()
    return WORKER_FORMAT_CACHE


def try_parse_datetime_strings(
    arr: pa.Array | pa.ChunkedArray, sample_size: int = 64,
    column: str | None = None, cache: "FormatCache | None" = None,
) -> pa.Array | None:
    """Format-search on a sample, then vectorized full parse with the
    winner. Returns the parsed timestamp[us] array or None.

    When ``column`` is given, the search consults the (worker-global or
    provided) FormatCache first — cache-frequency-ordered candidates —
    and records the winner back, so subsequent batches of the same
    column skip the format search almost entirely."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nn = arr.drop_null()
    if len(nn) == 0:
        return None
    candidates = None
    if column is not None:
        cache = cache if cache is not None else get_worker_format_cache()
        candidates = cache.candidates_for(column)
    fmt = find_format(nn.slice(0, sample_size), candidates)
    if fmt is None:
        return None
    if column is not None and cache is not None:
        cache.record(column, fmt)
    return parse_with_format(arr, fmt)


@dataclass
class FormatCache:
    """Mergeable (column, format) hit counter — distributed stand-in for
    the reference's pickled global ``format_cache`` (Profiler.py:126-135).
    """

    hits: Counter = field(default_factory=Counter)

    def record(self, column: str, fmt: str, n: int = 1) -> None:
        self.hits[(column, fmt)] += n

    def merge(self, other: "FormatCache") -> "FormatCache":
        return FormatCache(self.hits + other.hits)

    def candidates_for(self, column: str) -> list[str]:
        """Cache-frequency-ordered candidates (deterministic tie-break by
        canonical list order), then the full list — the distributed analog
        of Profiler.py:181-193."""
        ranked = sorted(
            ((f, c) for (col, f), c in self.hits.items() if col == column),
            key=lambda fc: (-fc[1], ALL_FORMATS.index(fc[0]) if fc[0] in ALL_FORMATS else 1 << 30),
        )
        cached = [f for f, _ in ranked]
        rest = [f for f in ALL_FORMATS if f not in set(cached)]
        return cached + rest
